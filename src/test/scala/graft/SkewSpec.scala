package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key") {
    // 90% of the big side hits one key — the classic hot-key shape
    val big = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 5).otherwise(0L).as("k"),
        $"id".as("payload"))
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "name")
    val plain = big.join(small, "k").groupBy("name")
      .agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .orderBy("name").collect()
    val salted = Skew.saltedJoin(big, small, "k", salts = 8).groupBy("name")
      .agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .orderBy("name").collect()
    assert(plain.toSeq == salted.toSeq)
  }

  test("bucketed tables join with zero exchanges") {
    val docs = spark.range(1000).select($"id".as("doc_id"),
      concat(lit("text"), $"id").as("text"))
    val scores = spark.range(1000).select($"id".as("doc_id"),
      ($"id" % 100).cast("double").as("score"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path: the point is that bucketing removes
      // the exchange a sort-merge join would otherwise need
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Skew.writeBucketed(docs, "graft_docs_b", "doc_id", buckets = 8)
      Skew.writeBucketed(scores, "graft_scores_b", "doc_id", buckets = 8)
      val joined = spark.table("graft_docs_b")
        .join(spark.table("graft_scores_b"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_docs_b")
      spark.sql("DROP TABLE IF EXISTS graft_scores_b")
    }
  }
}
