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

  /** Near-dup-aware ingest step — [[ingestBatch]] plus an LSH stage over
    * a PERSISTED band index (`band-index/v-*`, the ids-only
    * (doc_id, band, band_key) frame):
    *  1. exact stage: drop batch docs whose fingerprint is already
    *     indexed, keep first-in-batch per fp;
    *  2. corpus near-dup stage: batch bands join the band index;
    *     candidates verify with exact shingle Jaccard against the
    *     candidate corpus docs' text (fetched BY ID from the doc store —
    *     the row-store lookup of a real deployment), drops on
    *     jaccard ≥ threshold;
    *  3. in-batch near-dup stage: LSH within the remaining docs, one
    *     min-id representative per connected cluster.
    * Survivors append docs + fingerprints + bands. Thresholded
    * similarity is not transitive, so a doc whose only near-dup was
    * itself dropped in stage 2 survives — same greedy semantics as the
    * batch curation capstone. Deterministic given prior state, so the
    * version-dir replay discipline of [[ingestBatch]] carries over
    * unchanged.
    */
  def ingestBatchNearDup(
      batch: DataFrame,
      root: String,
      batchId: Long,
      threshold: Double = 0.8,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3): Unit = {
    val spark = batch.sparkSession
    val index = readIndex(spark, root, below = Some(batchId))
    val exactKept = batch.join(
      Dedup.incrementalDedupAgainstIndex(index, batch)
        .filter(col("status") === "kept")
        .select(col("doc_id")),
      Seq("doc_id"))
      .persist()
    val shB = Dedup.shingleFrame(exactKept, shingleSize).persist()
    try {
      val corpusBands = readVersions(spark, s"$root/band-index",
        below = Some(batchId))
      val corpusDup =
        if (corpusBands.columns.isEmpty) exactKept.limit(0).select(col("doc_id"))
        else {
          val candidates = corpusBands.as("c")
            .join(Dedup.bandFrame(shB, numHashes, bands).as("b"),
              col("c.band") === col("b.band") &&
                col("c.band_key") === col("b.band_key"))
            .select(col("c.doc_id").as("corpus_id"), col("b.doc_id").as("batch_id"))
            .dropDuplicates("corpus_id", "batch_id")
          val shCand = Dedup.shingleFrame(
            corpus(spark, root).join(
              candidates.select(col("corpus_id").as("doc_id")).distinct(),
              Seq("doc_id")),
            shingleSize)
          candidates
            .join(shCand.select(col("doc_id").as("corpus_id"), col("sh").as("sh_c")),
              "corpus_id")
            .join(shB.select(col("doc_id").as("batch_id"), col("sh").as("sh_b")),
              "batch_id")
            .withColumn("inter", size(array_intersect(col("sh_c"), col("sh_b"))))
            .filter(col("inter").cast("double") /
              (size(col("sh_c")) + size(col("sh_b")) - col("inter")) >= threshold)
            .select(col("batch_id").as("doc_id")).distinct()
        }
      val afterCorpus = exactKept.join(corpusDup, Seq("doc_id"), "left_anti")
      // in-batch pairs from the SAME persisted shingle frame (calling
      // minHashLsh here would persist a fresh copy per micro-batch and
      // pin storage for the stream's lifetime)
      val shIn = shB.join(afterCorpus.select(col("doc_id")), Seq("doc_id"))
      val bandsIn = Dedup.bandFrame(shIn, numHashes, bands)
      val inPairs = bandsIn.as("a")
        .join(bandsIn.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
        .join(shIn.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(shIn.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .filter(col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")) >= threshold)
        .select(col("doc_a"), col("doc_b"))
      val keepers = Dedup
        .nearDupClusters(afterCorpus.select(col("doc_id")), inPairs)
        .filter(col("doc_id") === col("cluster_id"))
        .select(col("doc_id"))
      val survivors = afterCorpus.join(keepers, Seq("doc_id")).persist()
      try {
        survivors.write.mode("overwrite").parquet(s"$root/docs/v-$batchId")
        survivors.select(
          Dedup.contentFingerprint(col("text")).as("fp"), col("doc_id"))
          .write.mode("overwrite").parquet(s"$root/fp-index/v-$batchId")
        Dedup.bandFrame(
          Dedup.shingleFrame(survivors, shingleSize), numHashes, bands)
          .write.mode("overwrite").parquet(s"$root/band-index/v-$batchId")
      } finally survivors.unpersist(blocking = false)
    } finally {
      shB.unpersist(blocking = false)
      exactKept.unpersist(blocking = false)
    }
  }

  /** [[ingestBatch]] with a PERSISTED Bloom gate — the shape that keeps
    * a mostly-new batch off the fingerprint-index join entirely. Each
    * batch writes `bloom-index/v-<batchId>.bloom`, the serialized
    * sketch of ITS OWN kept fingerprints; the next batch merges all
    * committed sketches below its id on the driver (sketches are
    * ~1.2 MB per 1M fps — model-sized, bounded by corpus growth not
    * corpus size) and gates the batch before the index join
    * ([[Dedup.incrementalDedupWithBloom]]; no false negatives, false
    * positives die in the inner join, so the kept set is byte-identical
    * to [[ingestBatch]]'s).
    *
    * All sketches of one store MUST share (expectedItems, fpp) —
    * `mergeInPlace` requires equal bit width; both are fixed per store
    * by the caller. Version commit is a temp-file + atomic-rename per
    * sketch, replay overwrites its own version (same discipline as the
    * parquet dirs), and index compaction leaves blooms untouched — a
    * merged read over v-files is already cheap.
    */
  def ingestBatchBloom(
      batch: DataFrame,
      root: String,
      batchId: Long,
      expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): Unit = {
    val spark = batch.sparkSession
    val index = readIndex(spark, root, below = Some(batchId))
    // Coverage guard: the gate is only sound if EVERY committed fp-index
    // version is covered by a sketch (a bloom-less version — pre-bloom
    // history, a lost file — would turn the gate's "definitely new"
    // into a false negative and admit duplicates). Uncovered → fall
    // back to the plain join, which is always correct. Compaction keeps
    // this monotone: folded fp versions renumber onto an existing
    // covered version, and stale sketches merely over-cover (safe).
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val fpVersions =
      committedVersions(fs, s"$root/fp-index", below = Some(batchId)).toSet
    val merged = readMergedBloom(spark, root, below = Some(batchId))
      .filter(_ => fpVersions.subsetOf(bloomVersions(spark, root, Some(batchId))))
    val labeled = merged match {
      case Some(bytes) => Dedup.incrementalDedupWithBloom(index, batch, bytes)
      case None => Dedup.incrementalDedupAgainstIndex(index, batch)
    }
    val kept = batch.join(
      labeled.filter(col("status") === "kept").select(col("doc_id")),
      Seq("doc_id"))
      .persist()
    try {
      kept.write.mode("overwrite").parquet(s"$root/docs/v-$batchId")
      val keptFps = kept.select(
        Dedup.contentFingerprint(col("text")).as("fp"), col("doc_id"))
      keptFps.write.mode("overwrite").parquet(s"$root/fp-index/v-$batchId")
      val bloomBytes = Dedup.buildFpBloom(
        keptFps.select(col("fp")), expectedItems, fpp)
      if (bloomBytes != null) writeBloomVersion(spark, root, batchId, bloomBytes)
    } finally kept.unpersist(blocking = false)
  }

  /** [[startIngest]] with the persisted-Bloom gate ([[ingestBatchBloom]]). */
  def startIngestBloom(
      docs: DataFrame,
      root: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchBloom(batch, root, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Merge every committed bloom sketch below `below` on the driver.
    * None when no sketch exists (fresh store or pre-bloom history).
    */
  private def listBloomFiles(
      spark: SparkSession,
      root: String,
      below: Option[Long]): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val path = s"$root/bloom-index"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("v-") &&
        s.getPath.getName.endsWith(".bloom"))
      .flatMap(s => s.getPath.getName
        .stripPrefix("v-").stripSuffix(".bloom").toLongOption.map(_ -> s.getPath))
      .filter { case (v, _) => below.forall(v < _) }
      .sortBy(_._1)
  }

  private def bloomVersions(
      spark: SparkSession,
      root: String,
      below: Option[Long]): Set[Long] =
    listBloomFiles(spark, root, below).map(_._1).toSet

  private def readMergedBloom(
      spark: SparkSession,
      root: String,
      below: Option[Long]): Option[Array[Byte]] = {
    import org.apache.spark.util.sketch.BloomFilter
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val versions = listBloomFiles(spark, root, below)
    if (versions.isEmpty) None
    else try {
      val merged = versions.map { case (_, p) =>
        val in = fs.open(p)
        try BloomFilter.readFrom(in) finally in.close()
      }.reduce { (a, b) => a.mergeInPlace(b); a }
      val bos = new java.io.ByteArrayOutputStream()
      merged.writeTo(bos)
      Some(bos.toByteArray)
    } catch {
      // incompatible sketch widths (a caller changed expectedItems/fpp
      // mid-store) or a torn file: disable the gate for this batch —
      // the plain index join is always correct, the gate only ever
      // saves work
      case e: Exception =>
        System.err.println(
          s"[ingest] bloom gate disabled for this batch: ${e.getMessage}")
        None
    }
  }

  /** Atomic per-version sketch commit: write to a dot-temp (invisible to
    * the version listing), fsync-close, rename over the target. Replay
    * overwrites its own version with identical bytes.
    */
  private def writeBloomVersion(
      spark: SparkSession,
      root: String,
      batchId: Long,
      bytes: Array[Byte]): Unit = {
    val path = s"$root/bloom-index"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(s"$path/v-$batchId.bloom")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/.v-$batchId.bloom.tmp")
    FsOps.deleteOrThrow(fs, tmp, recursive = false)
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    FsOps.deleteOrThrow(fs, target, recursive = false)
    FsOps.renameOrThrow(fs, tmp, target)
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

  /** [[startIngest]] with the near-dup LSH stage ([[ingestBatchNearDup]]). */
  def startIngestNearDup(
      docs: DataFrame,
      root: String,
      checkpoint: String,
      threshold: Double = 0.8,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchNearDup(batch, root, batchId, threshold)
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
  def compactIndex(spark: SparkSession, root: String): Int =
    compactVersioned(spark, s"$root/fp-index") +
      compactVersioned(spark, s"$root/band-index")

  private def compactVersioned(spark: SparkSession, path: String): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    healIndexCompaction(fs, path)
    val versions = committedVersions(fs, path, below = None)
    if (versions.size < 3) return 0
    val maxV = versions.max
    val folded = versions.filter(_ < maxV)
    val target = folded.max
    // plain-union fold: post-crash duplicate rows survive the merge and
    // stay harmless — readIndex collapses fps, candidate joins dedup
    val merged = spark.read.parquet(folded.sorted.map(v => s"$path/v-$v"): _*)
    // stage → park the live target → swap in → clean up; every window
    // between these steps is rolled forward/back by healIndexCompaction
    val staging = new org.apache.hadoop.fs.Path(s"$path/.compact-v-$target")
    FsOps.deleteOrThrow(fs, staging, recursive = true)
    merged.write.mode("overwrite").parquet(staging.toString)
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
    if (path.endsWith("-index")) healIndexCompaction(fs, path)
    val versions = committedVersions(fs, path, below)
    if (versions.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(versions.sorted.map(v => s"$path/v-$v"): _*)
  }
}
