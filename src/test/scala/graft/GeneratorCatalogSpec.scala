package graft

import org.apache.spark.sql.functions._
import graft.ops.{Catalog, Generator}

class GeneratorCatalogSpec extends SparkTestBase {
  import spark.implicits._

  test("synthetic events are deterministic across runs and partitionings") {
    val a = Generator.syntheticEvents(spark, 1000L).orderBy("event_id").collect()
    val b = Generator.syntheticEvents(spark, 1000L)
      .repartition(7).orderBy("event_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 1000)
    assert(a.map(_.getAs[String]("event_type")).distinct.sorted.toSeq ==
      Generator.EventTypes.sorted)
  }

  test("wire serialization round-trips through the pipeline parser") {
    val ev = Generator.randomEvents(spark, 50L)
    val wire = Generator.toWire(ev,
      Seq("id", "timestamp", "message", "user_id", "event_type", "value"))
    assert(wire.columns.toSeq == Seq("value"))
    val back = graft.ops.EventPipeline.parse(wire)
    assert(back.count() == 50)
    assert(back.filter(col("id").isNull || col("event_type").isNull).count() == 0)
  }

  test("rate stream produces parseable wire JSON") {
    val stream = Generator.rateStream(spark, rowsPerSecond = 100)
    assert(stream.isStreaming)
    assert(stream.schema.fieldNames.toSeq == Seq("value"))
    val q = graft.stream.Pipeline.process(stream)
      .writeStream.format("memory").queryName("rate_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      Thread.sleep(1200)
      q.processAllAvailable()
      val rows = spark.table("rate_sink")
      assert(rows.filter(col("data_quality_score") < 50).count() == 0)
    } finally q.stop()
  }

  test("csv export writes header + rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Generator.writeCsv(Generator.syntheticEvents(spark, 10L), dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 10)
    assert(back.columns.contains("event_type"))
  }

  test("catalog: database + declared-schema external table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tbl").toString
    Catalog.ensureEventsTable(spark, "graft_test_db", "events_sink", dir)
    assert(spark.catalog.tableExists("graft_test_db.events_sink"))
    val t = Catalog.readTable(spark, "graft_test_db", "events_sink")
    // file-based tables surface every column as nullable (Spark relaxes
    // nullability at the catalog boundary) — compare names + types
    assert(t.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      graft.schema.EventSchema.sinkSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(t.count() == 0) // empty until the sink writes
    // idempotent re-create
    Catalog.ensureEventsTable(spark, "graft_test_db", "events_sink", dir)

    // INFORMATION_SCHEMA.COLUMNS twin: one row per declared column, in
    // BigQuery's (column_name, data_type, is_nullable) convention
    val cols = Catalog.describeColumns(spark, "graft_test_db", "events_sink")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(cols.size == graft.schema.EventSchema.sinkSchema.fields.length)
    assert(cols("id")._1 == "STRING")
    assert(cols("timestamp")._1 == "TIMESTAMP")
    assert(cols("value")._1 == "DOUBLE")
    assert(cols("data_quality_score")._1 == "INT")
    assert(cols.values.forall(_._2 == "YES"),
      "file-based tables surface every column as nullable")
  }

  test("profileTable: exact per-column nulls/distincts and rendered extrema") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("b"), Some(1.005), Seq(1, 2)),
      (2L, None, Some(-0.005), Seq(3)),
      (3L, Some("a"), None, Seq.empty[Int]),
      (3L, Some("a"), Some(2.0), Seq(4)))
      .toDF("k", "s", "v", "arr")
    val out = Catalog.profileTable(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5)))).toMap
    assert(out.keySet == Set("k", "s", "v", "arr"))
    assert(out("k") == ((4L, 0L, 3L, Some("1"), Some("3"))))
    assert(out("s") == ((4L, 1L, 2L, Some("a"), Some("b"))))
    // doubles render at e2: HALF_UP at the cent boundary, both signs
    assert(out("v") == ((4L, 1L, 3L, Some("-1"), Some("200"))))
    // unorderable array column: counts still exact, extrema NULL
    assert(out("arr")._1 == 4L && out("arr")._2 == 0L && out("arr")._3 == 4L)
    assert(out("arr")._4.isEmpty && out("arr")._5.isEmpty)
  }

  test("profileTable: hostile column names (quotes, backticks, dots) profile intact") {
    // the 'profiles any table' claim, taken literally: names that would
    // corrupt any string-interpolated stack()/identifier are resolved
    // through typed Columns + doubled backticks, never re-parsed
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y"), (2L, null))
      .toDF("it's", "a.b`c")
    val out = Catalog.profileTable(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5)))).toMap
    assert(out.keySet == Set("it's", "a.b`c"))
    assert(out("it's") == ((3L, 0L, 2L, Some("1"), Some("2"))))
    assert(out("a.b`c") == ((3L, 1L, 2L, Some("x"), Some("y"))))
  }
}
