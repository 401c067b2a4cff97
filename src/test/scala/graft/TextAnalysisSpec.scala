package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("docStats: token counts, distinct, type-token ratio") {
    val df = Seq((1L, "Hello World hello", "en", 17L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val r = TextAnalysis.docStats(df).head()
    assert(r.getAs[Long]("n_tokens") == 3)
    assert(r.getAs[Long]("n_distinct_tokens") == 2) // lowercased
    assert(r.getAs[Double]("type_token_ratio") == 0.6667)
  }

  test("bpeish token count splits letter/digit/symbol runs") {
    val df = Seq((1L, "abc123 def!")).toDF("doc_id", "text")
    val n = df.select(TextAnalysis.bpeishTokenCount($"text")).as[Long].head()
    assert(n == 4) // abc | 123 | def | !
  }

  test("langId: marker votes with deterministic ties and 'und' fallback") {
    val df = Seq(
      (1L, "the cat of the house"),
      (2L, "der hund und die katze ist hier"),
      (3L, "zzz qqq xxx")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("en", 3L))
    assert(out(2L) == ("de", 4L))
    assert(out(3L) == ("und", 0L))
  }

  test("quality score components are bounded and averaged") {
    val text = ("the quick fox " * 10).trim // 139 chars → len band
    val df = Seq((1L, text, "en", text.length.toLong))
      .toDF("doc_id", "text", "lang", "n_chars")
    val r = TextAnalysis.qualityScore(df).head()
    assert(r.getAs[Double]("len_score") == 1.0)
    assert(r.getAs[Double]("stopword_score") <= 1.0)
    val exp = ((r.getAs[Double]("len_score") + r.getAs[Double]("stopword_score")
      + r.getAs[Double]("diversity")) / 3.0)
    assert(math.abs(r.getAs[Double]("quality") - exp) < 0.001)
  }

  test("rolling fingerprint: known value, content-sensitive") {
    val df = Seq((1L, "abc"), (2L, "abd"), (3L, "abc"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.rollingFingerprints(df).collect().map(_.getLong(1))
    assert(fps(0) == 96354L) // ((0*31+97)*31+98)*31+99
    assert(fps(0) != fps(1))
    assert(fps(0) == fps(2))
  }

  test("fingerprint is case/whitespace-insensitive") {
    val df = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "hello worlds")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(df).collect().map(_.getString(1))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }
}
