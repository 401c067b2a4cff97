package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Dev tool: stage-by-stage timing of the LSH dedup pipelines. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = TextAnalysis.documents(spark, sfDir)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label")
      r
    }

    time("docs count")(docs.count())
    time("shingles")(docs.select(Dedup.shingles(col("text")).as("sh"))
      .select(sum(size(col("sh")))).collect())
    time("sig")(docs.select(
      Dedup.minHashSignature(Dedup.shingles(col("text")), 64).as("sig"))
      .select(sum(size(col("sig")))).collect())
    val withSig = docs
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", Dedup.minHashSignature(col("sh"), 64))
    val bandKeys = array((0 until 16).map(b =>
      hash(slice(col("sig"), b * 4 + 1, 4), lit(b))): _*)
    val banded = withSig
      .select(col("doc_id"), col("sh"), posexplode(bandKeys))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
    time("banded explode")(banded.select(count(lit(1))).collect())
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a.sh").as("sh_a"),
        col("b.doc_id").as("doc_b"), col("b.sh").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
    val nCand = time("candidates")(candidates.count())
    println(s"          candidate pairs: $nCand")
    time("full minHashLsh")(Dedup.minHashLsh(docs, 0.05).count())
    time("full simHashPairs")(Dedup.simHashPairs(docs).count())
    spark.stop()
  }
}
