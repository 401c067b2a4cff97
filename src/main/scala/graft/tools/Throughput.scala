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

    val wire = Generator.toWire(Generator.randomEvents(spark, n),
      Seq("id", "timestamp", "message", "user_id", "event_type", "value"))
    // warm-up, then timed
    EventPipeline.fromRawJson(wire).count()
    val t0 = System.nanoTime()
    val out = EventPipeline.fromRawJson(wire).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"pipeline throughput: $n%d events in $sec%.2f s = ${n / sec}%.0f events/s (kept $out%d)")
    spark.stop()
  }
}
