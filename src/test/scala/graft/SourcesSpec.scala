package graft

import org.apache.spark.sql.DataFrame
import graft.ops.{EventPipeline, Generator, Sources}

class SourcesSpec extends SparkTestBase {

  private def sinkRows(): DataFrame = {
    val wire = Generator.toWire(Generator.randomEvents(spark, 100L),
      Seq("id", "timestamp", "message", "user_id", "event_type", "value"))
    EventPipeline.fromRawJson(wire, deterministic = true)
  }

  private def assertRoundTrip(
      write: (DataFrame, String) => Unit,
      read: String => DataFrame): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val original = sinkRows()
    write(original, dir)
    val back = read(dir)
    assert(back.schema.fieldNames.toSeq == original.schema.fieldNames.toSeq)
    val a = original.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("JSON-lines round-trip with declared schema") {
    assertRoundTrip(Sources.writeJsonl, Sources.readJsonl(spark, _))
  }

  test("ORC round-trip with declared schema") {
    assertRoundTrip(Sources.writeOrc, Sources.readOrc(spark, _))
  }

  test("CSV round-trip with declared schema and pinned timestamp format") {
    assertRoundTrip(Sources.writeCsv, Sources.readCsv(spark, _))
  }

  test("dynamic partition overwrite replaces only the backfilled day") {
    // the day-partition backfill contract: INSERT OVERWRITE in dynamic
    // mode rewrites exactly the partitions present in the incoming
    // frame; untouched days must survive BYTE-identical (same files),
    // or a one-day correction silently clobbers the whole sink
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpo").toString
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((1L, "d1", 10.0), (2L, "d1", 20.0), (3L, "d2", 30.0))
        .toDF("id", "day", "value")
        .write.partitionBy("day").mode("overwrite").parquet(dir)
      def filesOf(day: String) = {
        val d = new java.io.File(s"$dir/day=$day")
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
      }
      val d2Before = filesOf("d2")
      // backfill day d1 only
      Seq((9L, "d1", 99.0)).toDF("id", "day", "value")
        .write.partitionBy("day").mode("overwrite").parquet(dir)
      assert(filesOf("d2") == d2Before,
        "untouched partition was rewritten by a one-day backfill")
      val back = spark.read.parquet(dir)
        .select(col("id"), col("day"), col("value"))
        .orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(back.toSeq == Seq((3L, "d2", 30.0), (9L, "d1", 99.0)))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
