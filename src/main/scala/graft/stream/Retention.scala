package graft.stream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Retention + small-file compaction for the K1 append sink's
  * date-partitioned layout ([[Pipeline.startSink]]) — the reference's D5
  * retention advice (reference README.md:311-314) made executable. An
  * append-only date-partitioned table degrades monotonically at 100 TB:
  * old partitions accumulate forever and every micro-batch adds part
  * files, so scan cost goes metadata-bound long before it goes IO-bound.
  * The sweep drops partitions strictly below a cutoff date and rewrites
  * surviving partitions down to `targetFiles` part files.
  *
  * THE HARD PART is the sink manifest: [[Pipeline.startSink]] writes
  * through Spark's file-stream sink, which maintains `_spark_metadata`,
  * and a root read resolves files FROM THE MANIFEST, not from directory
  * listing. Deleting or rewriting data files without updating the log
  * would make every root read fail on missing files (or silently miss the
  * compacted ones). The sweep therefore rewrites the log files in place:
  * entries under expired partitions are dropped, entries for replaced
  * part files are swapped for the compacted files' entries, and batch ids
  * are NEVER renumbered — a restarted streaming query continues appending
  * at its checkpointed batch id untouched.
  *
  * Crash-safety is roll-FORWARD via an intent journal (the write-aside →
  * swap → heal pattern of [[Pipeline.compactUpsertTable]], extended with
  * a recorded plan because this sweep mutates many files):
  *  1. compacted replacements are written aside as `<partition>.compact`
  *     (invisible to readers and the manifest);
  *  2. the full plan — expired partitions, compacted partitions, every
  *     replacement file's (name, size, mtime) — is committed atomically
  *     as `_graft_sweep_intent` (write tmp + rename). This is the point
  *     of no return: BEFORE it, a crash leaves only stray asides that the
  *     next sweep deletes and redoes; AFTER it, [[healInterruptedSweep]]
  *     replays phases 3-5 idempotently from the recorded plan;
  *  3. manifest log files are rewritten (filter + append, idempotent,
  *     each via its own tmp → delete → rename with a heal rule for the
  *     delete/rename window);
  *  4. asides swap in (delete original dir, rename aside);
  *  5. expired partition dirs are deleted, then the intent is removed.
  *
  * Run it from the maintenance window: the sweep itself heals an
  * interrupted predecessor on entry, but it must not race a LIVE writer
  * (the manifest rewrite and a sink batch commit are not mutually
  * atomic) — stop the streaming query first, exactly like OPTIMIZE /
  * VACUUM on a transactional table. [[expireAndCompactSink]] enforces
  * this for writers visible in this session (refuses while an active
  * query's sink describes this path); cross-session writers remain the
  * operator's contract.
  */
object Retention {

  final case class PartitionCompaction(
      partition: String, filesBefore: Int, filesAfter: Int)

  final case class SinkSweepReport(
      expiredPartitions: Seq[String],
      compacted: Seq[PartitionCompaction],
      logFilesRewritten: Int)

  private val IntentName = "_graft_sweep_intent"
  private val MetadataDir = "_spark_metadata"

  private final case class ReplacementFile(name: String, size: Long, mtime: Long)
  private final case class SweepPlan(
      expired: Seq[String],
      compactions: Map[String, Seq[ReplacementFile]])

  /** Partition-expiry + compaction sweep. `cutoffDate` is ISO yyyy-MM-dd;
    * partitions with event_date strictly below it are dropped (ISO dates
    * compare correctly as strings). Idempotent: re-running after success
    * is a no-op, re-running after a crash completes the interrupted sweep
    * first.
    */
  def expireAndCompactSink(
      spark: SparkSession,
      path: String,
      cutoffDate: String,
      targetFiles: Int = 1): SinkSweepReport = {
    require(cutoffDate.matches("""\d{4}-\d{2}-\d{2}"""),
      s"cutoffDate must be ISO yyyy-MM-dd, got '$cutoffDate'")
    require(targetFiles > 0)
    val fs = FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    if (!fs.exists(root)) return SinkSweepReport(Nil, Nil, 0)

    // enforce the maintenance-window contract instead of trusting the
    // scaladoc: a live FileStreamSink writer on this path would race the
    // manifest rewrite (batch commit vs log rewrite are not mutually
    // atomic). Sink identity comes from the progress description
    // ("FileSink[<path>]"); a query that has not completed its first
    // batch yet has no progress and slips past this guard — the window
    // contract still applies.
    val qualifiedRoot = fs.makeQualified(root).toUri.toString
    spark.streams.active.foreach { q =>
      val sinkDesc = Option(q.lastProgress).map(_.sink.description)
      if (sinkDesc.exists(d => d.contains(path) || d.contains(qualifiedRoot)))
        throw new IllegalStateException(
          s"sweep refused: active streaming query ${q.id} writes to $path — " +
            "stop it before running retention (OPTIMIZE-style maintenance window)")
    }

    // finish a crashed predecessor before looking at current state —
    // its recorded plan may hide files this sweep would otherwise count
    healInterruptedSweep(spark, path)

    val parts = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("event_date="))
      .map(_.getPath.getName)
      .sorted
    val expired = parts.filter(_.stripPrefix("event_date=") < cutoffDate)
    val surviving = parts.filterNot(expired.contains)

    // When a manifest exists, the COMMITTED file set is the table — a
    // crashed sink batch can leave orphan part files on disk that the
    // log never admitted, and compacting from a directory listing would
    // resurrect those rows. Read only manifest-committed files; the swap
    // then garbage-collects the orphans along with the replaced files.
    val committed = committedByPartition(fs, root)
    def partitionFiles(p: String): Seq[Path] = committed match {
      case Some(m) => m.getOrElse(p, Seq.empty).map(n => new Path(new Path(root, p), n))
      case None => partFiles(fs, new Path(root, p)).map(_.getPath)
    }

    // phase 1: write compacted replacements ASIDE (no visibility change).
    // Stray asides from a pre-intent crash are deleted and redone.
    val toCompact = surviving.filter(p => partitionFiles(p).size > targetFiles)
    val compactions: Map[String, Seq[ReplacementFile]] = toCompact.map { p =>
      val aside = new Path(root, s"$p.compact")
      if (fs.exists(aside)) fs.delete(aside, true)
      spark.read.parquet(partitionFiles(p).map(_.toString): _*)
        .coalesce(targetFiles)
        .write.parquet(aside.toString)
      p -> partFiles(fs, aside).map(f =>
        ReplacementFile(f.getPath.getName, f.getLen, f.getModificationTime))
    }.toMap

    val before = toCompact.map(p => p -> partitionFiles(p).size).toMap
    val plan = SweepPlan(expired, compactions)
    if (plan.expired.isEmpty && plan.compactions.isEmpty)
      return SinkSweepReport(Nil, Nil, 0)

    // phase 2: COMMIT the plan (atomic rename) — the point of no return
    writeIntent(fs, root, plan)
    // phases 3-5 + intent removal
    val logsRewritten = executePlan(spark, fs, root, plan)

    SinkSweepReport(
      plan.expired,
      toCompact.map(p => PartitionCompaction(p, before(p), compactions(p).size)),
      logsRewritten)
  }

  /** Roll FORWARD an interrupted sweep: if an intent journal exists, its
    * recorded plan is replayed (all steps are idempotent) and the journal
    * removed. Safe to call on a healthy table — no intent, no action.
    */
  def healInterruptedSweep(spark: SparkSession, path: String): Boolean = {
    val fs = FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    val intent = new Path(root, IntentName)
    // a stray tmp from a crash BEFORE the commit rename is dead weight
    val tmp = new Path(root, s"$IntentName.tmp")
    if (fs.exists(tmp)) deleteOrThrow(fs, tmp, recursive = false)
    if (!fs.exists(intent)) return false
    executePlan(spark, fs, root, readIntent(fs, intent))
    true
  }

  // ---- phases 3-5 (idempotent; shared by sweep and heal) ----

  private def executePlan(
      spark: SparkSession, fs: FileSystem, root: Path, plan: SweepPlan): Int = {
    val rewritten = rewriteManifest(fs, root, plan)
    // phase 4: swap asides in. Idempotence per partition:
    //  aside + original  → delete original, rename (the normal path; the
    //                      original still holds the pre-compaction files)
    //  aside only        → crash hit between delete and rename: rename
    //  original only     → already swapped on a previous attempt: no-op
    // Every rename/delete checks its boolean result (HDFS-style
    // filesystems report failure by returning false, not throwing): an
    // incomplete swap must ABORT before the intent journal is removed,
    // so healInterruptedSweep can still roll the plan forward.
    plan.compactions.keys.toSeq.sorted.foreach { p =>
      val orig = new Path(root, p)
      val aside = new Path(root, s"$p.compact")
      if (fs.exists(aside)) {
        deleteOrThrow(fs, orig, recursive = true)
        renameOrThrow(fs, aside, orig)
      }
    }
    // phase 5: expired partitions out, then the intent marker
    plan.expired.foreach(p => deleteOrThrow(fs, new Path(root, p), recursive = true))
    deleteOrThrow(fs, new Path(root, IntentName), recursive = false)
    rewritten
  }

  // checked mutations shared with Pipeline's upsert maintenance — a
  // thrown failure leaves the intent journal in place for the next heal
  private def deleteOrThrow(fs: FileSystem, p: Path, recursive: Boolean): Unit =
    FsOps.deleteOrThrow(fs, p, recursive)

  private def renameOrThrow(fs: FileSystem, from: Path, to: Path): Unit =
    FsOps.renameOrThrow(fs, from, to)

  /** Rewrite every `_spark_metadata` log file against the plan: drop
    * entries under expired partitions; under compacted partitions keep
    * ONLY the recorded replacement files, appending their entries to the
    * highest-numbered log file if absent. Batch ids never change.
    * Idempotent: a second pass filters nothing further and appends
    * nothing new.
    */
  private def rewriteManifest(fs: FileSystem, root: Path, plan: SweepPlan): Int = {
    val metaDir = new Path(root, MetadataDir)
    if (!fs.exists(metaDir)) return 0
    // FIRST resolve log-rewrite tmps from a crashed predecessor: a crash
    // between writeFileAtomic's delete and rename leaves the rewritten
    // content ONLY in `<name>.graft-tmp`, and the log listing below
    // matches numeric names only — without this sweep the log file would
    // silently vanish from the manifest. Orig missing → finish the swap;
    // orig present → the tmp is a stale pre-delete copy, drop it (this
    // pass recomputes it idempotently).
    fs.listStatus(metaDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".graft-tmp"))
      .foreach { tmp =>
        val orig = new Path(metaDir, tmp.getPath.getName.stripSuffix(".graft-tmp"))
        if (!fs.exists(orig)) renameOrThrow(fs, tmp.getPath, orig)
        else deleteOrThrow(fs, tmp.getPath, recursive = false)
      }
    val logFiles = fs.listStatus(metaDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.matches("""\d+(\.compact)?"""))
      .map(_.getPath)
      .sortBy(p => (p.getName.stripSuffix(".compact").toLong, p.getName.length))
    if (logFiles.isEmpty) return 0

    val replacementNames: Map[String, Set[String]] =
      plan.compactions.map { case (p, fsz) => p -> fsz.map(_.name).toSet }

    // an entry line is dropped when its "path" falls in an expired
    // partition, or in a compacted partition without being a recorded
    // replacement file
    def keepLine(line: String): Boolean =
      jsonField(line, "path") match {
        case None => true
        case Some(p) => partitionAndName(p) match {
          case Some((part, name)) =>
            if (plan.expired.contains(part)) false
            else replacementNames.get(part).forall(_.contains(name))
          case None => true
        }
      }

    var changed = 0
    logFiles.foreach { lf =>
      val lines = readLines(fs, lf)
      val kept = lines.filter(keepLine)
      val isLast = lf == logFiles.last
      val appended: Seq[String] = if (!isLast) Seq.empty else {
        val present = kept.flatMap(jsonField(_, "path")).toSet
        plan.compactions.toSeq.sortBy(_._1).flatMap { case (part, files) =>
          files.sortBy(_.name).flatMap { f =>
            // fully qualified (scheme + authority) like the sink's own
            // entries — mixed scheme-less/qualified paths read as two
            // conflicting table roots at partition inference
            val uri = fs.makeQualified(new Path(new Path(root, part), f.name))
              .toUri.toString
            if (present.exists(_.endsWith(s"/$part/${f.name}"))) None
            else Some(entryJson(uri, f.size, f.mtime))
          }
        }
      }
      if (kept.size != lines.size || appended.nonEmpty) {
        writeFileAtomic(fs, lf, kept ++ appended)
        changed += 1
      }
    }
    changed
  }

  // ---- intent journal (line format, no JSON parser needed) ----

  private def writeIntent(fs: FileSystem, root: Path, plan: SweepPlan): Unit = {
    val lines = Seq("v1") ++
      plan.expired.map(p => s"expired=$p") ++
      plan.compactions.toSeq.sortBy(_._1).flatMap { case (p, files) =>
        s"compact=$p" +: files.map(f => s"file=$p|${f.name}|${f.size}|${f.mtime}")
      }
    val tmp = new Path(root, s"$IntentName.tmp")
    writeLines(fs, tmp, lines)
    renameOrThrow(fs, tmp, new Path(root, IntentName))
  }

  private def readIntent(fs: FileSystem, intent: Path): SweepPlan = {
    val lines = readLines(fs, intent)
    require(lines.headOption.contains("v1"), s"unknown sweep intent format at $intent")
    val expired = lines.collect { case l if l.startsWith("expired=") =>
      l.stripPrefix("expired=") }
    val files = lines.collect { case l if l.startsWith("file=") =>
      l.stripPrefix("file=").split('|') match {
        case Array(p, name, size, mtime) =>
          p -> ReplacementFile(name, size.toLong, mtime.toLong)
        case other => throw new IllegalStateException(
          s"corrupt sweep intent line: ${other.mkString("|")}")
      }
    }
    val compactParts = lines.collect { case l if l.startsWith("compact=") =>
      l.stripPrefix("compact=") }
    val grouped = files.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    SweepPlan(expired, compactParts.map(p => p -> grouped.getOrElse(p, Seq.empty)).toMap)
  }

  // ---- small helpers ----

  /** Committed (part-dir → file names) per the manifest, in log order with
    * "delete" actions applied; None when the table has no manifest (then
    * directory listing is authoritative).
    */
  private def committedByPartition(
      fs: FileSystem, root: Path): Option[Map[String, Seq[String]]] = {
    val metaDir = new Path(root, MetadataDir)
    if (!fs.exists(metaDir)) return None
    val logFiles = fs.listStatus(metaDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.matches("""\d+(\.compact)?"""))
      .map(_.getPath)
      .sortBy(p => (p.getName.stripSuffix(".compact").toLong, p.getName.length))
    val live = scala.collection.mutable.LinkedHashMap.empty[(String, String), Unit]
    logFiles.foreach { lf =>
      readLines(fs, lf).foreach { line =>
        (jsonField(line, "path"), jsonField(line, "action")) match {
          case (Some(p), action) => partitionAndName(p).foreach { key =>
            if (action.contains("delete")) live.remove(key)
            else live.put(key, ())
          }
          case _ =>
        }
      }
    }
    Some(live.keys.toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap)
  }

  private def partFiles(fs: FileSystem, dir: Path) =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))

  /** partition dir name + file name of a manifest entry path, when the
    * path points inside an `event_date=` partition of this table.
    */
  private def partitionAndName(uriPath: String): Option[(String, String)] = {
    val segs = uriPath.split('/')
    if (segs.length < 2) None
    else {
      val (part, name) = (segs(segs.length - 2), segs.last)
      if (part.startsWith("event_date=")) Some((part, name)) else None
    }
  }

  /** Minimal extractor for one string field of a single-line JSON object —
    * the manifest entries are machine-written one-per-line with no nested
    * escaping of interest (paths with quotes would already have broken the
    * sink itself).
    */
  private def jsonField(line: String, field: String): Option[String] = {
    val marker = "\"" + field + "\":\""
    val i = line.indexOf(marker)
    if (i < 0) None
    else {
      val start = i + marker.length
      val end = line.indexOf('"', start)
      if (end < 0) None else Some(line.substring(start, end))
    }
  }

  /** A manifest entry for a compacted replacement file, in the field set
    * the file-stream sink's SinkFileStatus expects.
    */
  private def entryJson(uri: String, size: Long, mtime: Long): String =
    s"""{"path":"$uri","size":$size,"isDir":false,"modificationTime":$mtime,""" +
      s""""blockReplication":1,"blockSize":33554432,"action":"add"}"""

  private def readLines(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  private def writeLines(fs: FileSystem, p: Path, lines: Seq[String]): Unit = {
    val out = fs.create(p, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** tmp → delete → rename. The delete/rename crash window is healed by
    * [[rewriteManifest]]'s leading tmp sweep on the next (journal-driven)
    * replay — by the time this runs, no orphan tmp can exist.
    */
  private def writeFileAtomic(fs: FileSystem, p: Path, lines: Seq[String]): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".graft-tmp")
    writeLines(fs, tmp, lines)
    deleteOrThrow(fs, p, recursive = false)
    renameOrThrow(fs, tmp, p)
  }
}
