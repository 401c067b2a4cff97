package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.{EventPipeline, Generator}

/** Dev tool: steady-state throughput of the full parse→validate→enrich→
  * score→filter chain over generated wire-format JSON (events/second).
  * Context: the reference producer publishes ≤10 events/s
  * (web-application.py bulk path); its Dataflow plane is unbenchmarked.
  */
object Throughput {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // persist the wire frame so the timed window covers ONLY the parse
    // chain, not generation+serialization (same fix as graft.Bench:
    // unpersisted, each count re-ran the generator and under-reported
    // the chain ~8x); best-of-3 passes reject co-tenant interference
    val wire = Generator.toWire(Generator.randomEvents(spark, n),
      Seq("id", "timestamp", "message", "user_id", "event_type", "value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    wire.count()
    EventPipeline.fromRawJson(wire).count() // codegen/JIT warm-up
    val (sec, out) = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val kept = EventPipeline.fromRawJson(wire).count()
      ((System.nanoTime() - t0) / 1e9, kept)
    }.minBy(_._1)
    println(f"pipeline throughput: $n%d events in $sec%.2f s = ${n / sec}%.0f events/s (kept $out%d)")
    spark.stop()
  }
}
