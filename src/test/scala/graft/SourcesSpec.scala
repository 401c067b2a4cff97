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
}
