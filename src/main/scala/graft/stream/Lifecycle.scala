package graft.stream

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Control-plane twins of the reference's Airflow operators (SURVEY §3.2):
  * job-status sensing, health metrics, processed/error counters.
  */
object Lifecycle {

  /** W7: the DataflowJobStatusSensor twin — poll until the query is
    * actively processing (or the timeout lapses). The reference polls for
    * JOB_STATE_RUNNING every 30 s up to 600 s (Streamingdag.py:368-377).
    */
  def awaitActive(
      query: StreamingQuery,
      timeoutMs: Long = 600000,
      pollMs: Long = 1000): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline) {
      if (query.isActive && query.recentProgress.nonEmpty) return true
      if (query.exception.isDefined) return false
      Thread.sleep(pollMs)
    }
    query.isActive
  }

  /** W8: processed/error record counters, the Spark twin of the Beam
    * `Metrics.counter('pipeline', ...)` the README documents
    * (README.md:331-340). Input rows come from query progress; rows the
    * pipeline dropped are inferred as input - output per micro-batch.
    */
  final class PipelineMetrics extends StreamingQueryListener {
    val inputRows = new AtomicLong(0)
    val outputRows = new AtomicLong(0)

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      inputRows.addAndGet(e.progress.numInputRows)
      // sinks that don't report output rows send -1 — accumulating that
      // would corrupt the counter and inflate droppedRows
      Option(e.progress.sink).filter(_.numOutputRows >= 0)
        .foreach(s => outputRows.addAndGet(s.numOutputRows))
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    def droppedRows: Long = math.max(0L, inputRows.get - outputRows.get)
  }

  def register(spark: SparkSession): PipelineMetrics = {
    val m = new PipelineMetrics
    spark.streams.addListener(m)
    m
  }
}
