package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Dedup

/** Continuously deduplicated document ingest: each micro-batch is
  * annotated against the PERSISTED fingerprint index
  * ([[Dedup.incrementalDedupAgainstIndex]]), only `kept` docs (corpus-new,
  * first-in-batch) are appended, and the index grows by exactly their
  * fingerprints — so the corpus converges to one doc per normalized text
  * no matter how often sources re-crawl the same page.
  *
  * Layout under `root`:
  * {{{
  *   docs/v-<batchId>/      kept docs of that batch (parquet)
  *   fp-index/v-<batchId>/  their (fp, doc_id) rows
  * }}}
  *
  * Exactly-once without a transaction log: foreachBatch re-delivers
  * at-least-once, so [[ingestBatch]] reads index versions STRICTLY BELOW
  * its own batchId and OVERWRITES its own version dirs — a re-delivered
  * batch recomputes the same kept set against the same prior state and
  * rewrites identical output (same dance as [[Pipeline.upsertBatch]]).
  * Reading v < batchId also means a crash between the docs write and the
  * index write just replays into identical overwrites.
  *
  * Scale shape: the index is fingerprints only — 24 bytes/doc against a
  * 100 TB corpus of text — and each batch's work is one join against it
  * plus batch-local aggregation; nothing corpus-sized is rewritten, ever.
  * At petabyte scale the index dir becomes a bucketed table so the join
  * prunes to touched buckets, exactly like the upsert sink's layout.
  */
object IngestDedup {

  /** One ingest step — public so tests and batch backfills can drive
    * re-delivery deterministically.
    */
  def ingestBatch(batch: DataFrame, root: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val index = readIndex(spark, root, below = Some(batchId))
    val kept = batch.join(
      Dedup.incrementalDedupAgainstIndex(index, batch)
        .filter(col("status") === "kept")
        .select(col("doc_id")),
      Seq("doc_id"))
      .persist()
    try {
      kept.write.mode("overwrite").parquet(s"$root/docs/v-$batchId")
      kept.select(
        Dedup.contentFingerprint(col("text")).as("fp"),
        col("doc_id"))
        .write.mode("overwrite").parquet(s"$root/fp-index/v-$batchId")
    } finally kept.unpersist(blocking = false)
  }

  /** Start the streaming ingest over a stream of (doc_id, text, ...) rows. */
  def startIngest(
      docs: DataFrame,
      root: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, root, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** The deduplicated corpus: union of every committed batch's kept docs. */
  def corpus(spark: SparkSession, root: String): DataFrame =
    readVersions(spark, s"$root/docs", below = None)

  /** The fingerprint index (fp, doc_id) — one row per distinct normalized
    * text ever ingested.
    */
  def readIndex(
      spark: SparkSession,
      root: String,
      below: Option[Long] = None): DataFrame = {
    val idx = readVersions(spark, s"$root/fp-index", below)
    if (idx.columns.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("fp",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("corpus_keeper",
            org.apache.spark.sql.types.LongType))))
    else idx.select(col("fp"), col("doc_id").as("corpus_keeper"))
  }

  private def readVersions(
      spark: SparkSession,
      path: String,
      below: Option[Long]): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    val versions =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v-"))
        .flatMap(s => s.getPath.getName.stripPrefix("v-").toLongOption)
        .filter(v => below.forall(v < _))
        // only versions whose write committed; a half-written overwrite
        // target is re-overwritten by its own replay, never read
        .filter(v => fs.exists(new org.apache.hadoop.fs.Path(
          s"$path/v-$v/_SUCCESS")))
    if (versions.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(versions.sorted.map(v => s"$path/v-$v"): _*)
  }
}
