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
    * text ever ingested. Defensive min-keeper aggregation: sequential
    * ingest never writes an fp twice, but a compaction interrupted
    * between its merged write and the old-version deletes legitimately
    * leaves the same (fp, keeper) row in two version dirs — collapsing
    * here keeps every reader (and the ingest join) convergent through
    * that window.
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
    else idx.groupBy(col("fp")).agg(min(col("doc_id")).as("corpus_keeper"))
  }

  /** Fold committed index versions together — run periodically
    * (maintenance window, like the sink compactions): one version dir
    * accrues per micro-batch, and a scan over thousands of small dirs
    * goes metadata-bound long before it goes IO-bound.
    *
    * The HIGHEST version is never touched: it may belong to a batch the
    * stream has not yet committed to its checkpoint, and a replay of
    * that batch reads versions strictly below it — folding history into
    * the highest dir would hand the replay an empty prior state and let
    * it overwrite the merged index with just its own rows. Everything
    * below max is replay-safe (batch N commits before N+1 starts) and is
    * folded into the second-highest version.
    *
    * Crash-safe without a journal: the merge is staged then swapped into
    * the target (checked mutations), old dirs deleted last. A crash
    * between swap and deletes leaves duplicate (fp, keeper) rows across
    * dirs — [[readIndex]]'s min-keeper collapse makes that window
    * invisible, and the next compaction sweeps the leftovers. Returns
    * the number of versions folded away.
    */
  def compactIndex(spark: SparkSession, root: String): Int = {
    val path = s"$root/fp-index"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    healIndexCompaction(fs, path)
    val versions = committedVersions(fs, path, below = None)
    if (versions.size < 3) return 0
    val maxV = versions.max
    val folded = versions.filter(_ < maxV)
    val target = folded.max
    val merged = readIndex(spark, root, below = Some(maxV))
    // stage → park the live target → swap in → clean up; every window
    // between these steps is rolled forward/back by healIndexCompaction
    val staging = new org.apache.hadoop.fs.Path(s"$path/.compact-v-$target")
    FsOps.deleteOrThrow(fs, staging, recursive = true)
    merged.select(col("fp"), col("corpus_keeper").as("doc_id"))
      .write.mode("overwrite").parquet(staging.toString)
    val live = new org.apache.hadoop.fs.Path(s"$path/v-$target")
    val parked = new org.apache.hadoop.fs.Path(s"$path/.old-v-$target")
    FsOps.renameOrThrow(fs, live, parked)
    FsOps.renameOrThrow(fs, staging, live)
    FsOps.deleteOrThrow(fs, parked, recursive = true)
    folded.filter(_ != target).foreach { v =>
      FsOps.deleteOrThrow(fs,
        new org.apache.hadoop.fs.Path(s"$path/v-$v"), recursive = true)
    }
    folded.size - 1
  }

  /** Roll an interrupted [[compactIndex]] forward or back so no
    * fingerprint is ever lost to a crash window:
    *  - staging committed (`_SUCCESS`) and the live target parked or
    *    gone → roll FORWARD (staging becomes live, parked copy dropped);
    *  - staging uncommitted but a parked copy exists → roll BACK
    *    (parked copy restored, staging dropped);
    *  - staging stale next to an intact live dir → drop staging;
    *  - parked copy left beside an intact live dir → drop it.
    * Leftover already-folded version dirs (crash mid-deletes) need no
    * healing: [[readIndex]] collapses their duplicate rows and the next
    * compaction sweeps them.
    */
  private def healIndexCompaction(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) return
    val names = fs.listStatus(root).map(_.getPath.getName)
    names.collect {
      case n if n.startsWith(".compact-v-") => n.stripPrefix(".compact-v-")
      case n if n.startsWith(".old-v-") => n.stripPrefix(".old-v-")
    }.distinct.foreach { v =>
      val staging = new org.apache.hadoop.fs.Path(s"$path/.compact-v-$v")
      val parked = new org.apache.hadoop.fs.Path(s"$path/.old-v-$v")
      val live = new org.apache.hadoop.fs.Path(s"$path/v-$v")
      val stagingCommitted = fs.exists(
        new org.apache.hadoop.fs.Path(s"$path/.compact-v-$v/_SUCCESS"))
      if (fs.exists(live)) {
        FsOps.deleteOrThrow(fs, staging, recursive = true)
        FsOps.deleteOrThrow(fs, parked, recursive = true)
      } else if (stagingCommitted) {
        FsOps.renameOrThrow(fs, staging, live)
        FsOps.deleteOrThrow(fs, parked, recursive = true)
      } else if (fs.exists(parked)) {
        FsOps.renameOrThrow(fs, parked, live)
        FsOps.deleteOrThrow(fs, staging, recursive = true)
      }
    }
  }

  private def committedVersions(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String,
      below: Option[Long]): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v-"))
      .flatMap(s => s.getPath.getName.stripPrefix("v-").toLongOption)
      .filter(v => below.forall(v < _))
      // only versions whose write committed; a half-written overwrite
      // target is re-overwritten by its own replay, never read
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(
        s"$path/v-$v/_SUCCESS")))
  }

  private def readVersions(
      spark: SparkSession,
      path: String,
      below: Option[Long]): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    if (path.endsWith("/fp-index")) healIndexCompaction(fs, path)
    val versions = committedVersions(fs, path, below)
    if (versions.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(versions.sorted.map(v => s"$path/v-$v"): _*)
  }
}
