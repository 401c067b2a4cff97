package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print schema + sample rows for every testdata table. */
object Inspect {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      println(s"=== $t (${df.count()} rows) ===")
      df.printSchema()
      df.show(3, truncate = 60)
    }
    import org.apache.spark.sql.functions._
    val ev = graft.ops.Analytics.events(spark, sfDir)
    ev.select(min("ts"), max("ts")).show(truncate = false)
    spark.stop()
  }
}
