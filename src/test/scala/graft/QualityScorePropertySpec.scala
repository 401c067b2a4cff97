package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.ops.EventPipeline

/** Property-style checks (SURVEY §5.2-4) over seeded random inputs:
  * score ∈ {0,25,50,75,100}; gate ⟺ at least two of four conditions;
  * to_json ∘ from_json roundtrip stability.
  */
class QualityScorePropertySpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(42)

  private def randomEvent(): (String, String, String, String, String, Double) = {
    def maybe(s: => String): String =
      if (rnd.nextBoolean()) s else if (rnd.nextBoolean()) "" else "unknown"
    (
      s"id-${rnd.nextInt(1000)}",
      if (rnd.nextBoolean()) "2024-01-15T10:00:00Z" else "2024-02-01T03:04:05Z",
      maybe(s"msg ${rnd.nextInt(100)}"),
      maybe(s"user_${rnd.nextInt(50)}"),
      "click",
      if (rnd.nextBoolean()) rnd.nextDouble() * 100 else 0.0)
  }

  test("score is always a multiple of 25 in [0,100], gate ⟺ score>=50") {
    val rows = Seq.fill(300)(randomEvent())
    val df = rows.toDF("id", "timestamp", "message", "user_id", "event_type", "value")
    val scored = EventPipeline.enrich(df, deterministic = true)
    val scores = scored.select("data_quality_score").as[Int].collect()
    assert(scores.forall(s => s >= 0 && s <= 100 && s % 25 == 0))
    // recompute expectation row-locally in Scala
    val expected = rows.map { case (_, ts, msg, user, _, value) =>
      (if (user != null && user.nonEmpty && user != "unknown") 25 else 0) +
        (if (msg != null && msg.nonEmpty) 25 else 0) +
        (if (value > 0) 25 else 0) +
        (if (ts.nonEmpty) 25 else 0)
    }
    assert(scores.toSeq == expected)
    val kept = EventPipeline.qualityFilter(scored).count()
    assert(kept == expected.count(_ >= 50))
  }

  test("to_json ∘ from_json roundtrip preserves all wire fields") {
    val rows = Seq.fill(100)(randomEvent())
    val df = rows.toDF("id", "timestamp", "message", "user_id", "event_type", "value")
    val json = df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
    val back = EventPipeline.parse(json)
    val a = df.orderBy("id", "value").collect().toSeq
    val b = back.select("id", "timestamp", "message", "user_id", "event_type", "value")
      .orderBy("id", "value").collect().toSeq
    assert(a == b)
  }
}
