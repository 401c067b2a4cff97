package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger
import graft.stream.{Lifecycle, Pipeline, Retention}

/** Retention + compaction sweep for the K1 date-partitioned append sink
  * (reference D5): expiry drops old partitions, compaction collapses
  * micro-batch file litter, and BOTH keep the file-stream sink's
  * `_spark_metadata` manifest consistent — the root read below resolves
  * files through the manifest, so every assertion doubles as a manifest-
  * integrity check.
  */
class RetentionSpec extends SparkTestBase {

  private def wire(id: String, iso: String): String =
    s"""{"id":"$id","timestamp":"$iso","message":"retention test $id","user_id":"ret_tester","event_type":"test","value":1.0,"source":"spec"}"""

  /** Run the real streaming sink over `batches` of wire messages, one
    * micro-batch per element, same checkpoint throughout — each batch
    * appends part files to the partitions it touches and entries to the
    * manifest, exactly the litter pattern a long-running sink produces.
    */
  private def runSink(dir: String, batches: Seq[Seq[String]]): Unit = {
    val srcDir = s"$dir/in"; val outDir = s"$dir/out"; val ckpt = s"$dir/ckpt"
    new java.io.File(srcDir).mkdirs()
    batches.zipWithIndex.foreach { case (msgs, i) =>
      Files.writeString(Paths.get(s"$srcDir/batch$i.jsonl"), msgs.mkString("", "\n", "\n"))
      val q = Pipeline.startSink(
        Pipeline.process(Pipeline.fromTextDir(spark, srcDir)),
        outDir, ckpt, trigger = Trigger.AvailableNow())
      try {
        assert(Lifecycle.awaitActive(q, timeoutMs = 60000) || !q.isActive)
        q.awaitTermination(60000)
      } finally if (q.isActive) q.stop()
    }
  }

  private def partDirs(outDir: String): Seq[String] =
    new java.io.File(outDir).list().filter(_.startsWith("event_date=")).toSeq.sorted

  private def partFileCount(outDir: String, part: String): Int =
    new java.io.File(s"$outDir/$part").list().count(_.startsWith("part-"))

  test("sweep: expired partitions gone, survivors byte-identical and compacted, manifest consistent") {
    val dir = Files.createTempDirectory("graft_retention").toString
    val outDir = s"$dir/out"
    runSink(dir, Seq(
      Seq(wire("a1", "2024-01-10T10:00:00Z"), wire("b1", "2024-01-20T10:00:00Z")),
      Seq(wire("a2", "2024-01-10T11:00:00Z"), wire("b2", "2024-01-20T11:00:00Z")),
      Seq(wire("b3", "2024-01-20T12:00:00Z"), wire("c1", "2024-01-25T09:00:00Z"))))
    assert(partDirs(outDir) ==
      Seq("event_date=2024-01-10", "event_date=2024-01-20", "event_date=2024-01-25"))
    assert(partFileCount(outDir, "event_date=2024-01-20") >= 3)

    // expected survivors, captured through the manifest BEFORE the sweep
    val before = spark.read.parquet(outDir)
      .filter(org.apache.spark.sql.functions.col("event_date") >= "2024-01-15")
      .collect().map(_.toString).sorted

    val report = Retention.expireAndCompactSink(spark, outDir, "2024-01-15")
    assert(report.expiredPartitions == Seq("event_date=2024-01-10"))
    assert(report.compacted.map(_.partition).sorted ==
      Seq("event_date=2024-01-20", "event_date=2024-01-25").filter(p =>
        report.compacted.exists(_.partition == p)))
    assert(report.compacted.exists(_.partition == "event_date=2024-01-20"))
    assert(report.logFilesRewritten > 0, "manifest was not rewritten")

    // disk: expired gone, compacted down to one file each
    assert(partDirs(outDir) == Seq("event_date=2024-01-20", "event_date=2024-01-25"))
    assert(partFileCount(outDir, "event_date=2024-01-20") == 1)

    // root read STILL goes through the manifest and returns exactly the
    // surviving rows — file-level content equality, not just counts
    val after = spark.read.parquet(outDir).collect().map(_.toString).sorted
    assert(after.toSeq == before.toSeq, "survivors not byte-identical after sweep")

    // idempotence: a second sweep finds nothing to do
    val again = Retention.expireAndCompactSink(spark, outDir, "2024-01-15")
    assert(again.expiredPartitions.isEmpty && again.compacted.isEmpty)
  }

  test("sweep refuses while a live query writes the sink path") {
    val dir = Files.createTempDirectory("graft_ret_guard").toString
    val srcDir = s"$dir/in"; val outDir = s"$dir/out"; val ckpt = s"$dir/ckpt"
    new java.io.File(srcDir).mkdirs()
    Files.writeString(Paths.get(s"$srcDir/b0.jsonl"),
      wire("g1", "2024-01-01T00:00:00Z") + "\n")
    val q = Pipeline.startSink(
      Pipeline.process(Pipeline.fromTextDir(spark, srcDir)),
      outDir, ckpt, trigger = Trigger.ProcessingTime(100))
    try {
      // the guard reads the sink identity from query progress — wait
      // until the first batch has reported
      val deadline = System.currentTimeMillis() + 60000
      while (q.lastProgress == null && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(q.lastProgress != null, "sink never produced progress")
      intercept[IllegalStateException] {
        Retention.expireAndCompactSink(spark, outDir, "2030-01-01")
      }
    } finally if (q.isActive) q.stop()
    // once the writer is stopped the sweep runs (no-op cutoff is fine)
    Retention.expireAndCompactSink(spark, outDir, "1970-01-01")
  }

  test("interrupted sweep rolls forward: committed intent + asides heal to the swept state") {
    val dir = Files.createTempDirectory("graft_retention_heal").toString
    val outDir = s"$dir/out"
    runSink(dir, Seq(
      Seq(wire("a1", "2024-01-10T10:00:00Z"), wire("b1", "2024-01-20T10:00:00Z")),
      Seq(wire("b2", "2024-01-20T11:00:00Z"))))
    val before = spark.read.parquet(outDir)
      .filter(org.apache.spark.sql.functions.col("event_date") >= "2024-01-15")
      .collect().map(_.toString).sorted

    // simulate a sweep that crashed right after its commit point: the
    // aside is written and the intent journal (stable v1 line format —
    // the crash contract) is in place, but no swap/expiry/manifest
    // rewrite has happened yet
    val part = "event_date=2024-01-20"
    val aside = s"$outDir/$part.compact"
    spark.read.parquet(s"$outDir/$part").coalesce(1).write.parquet(aside)
    val files = new java.io.File(aside).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    val intentLines = Seq("v1", "expired=event_date=2024-01-10", s"compact=$part") ++
      files.map(f => s"file=$part|${f.getName}|${f.length}|${f.lastModified}")
    Files.writeString(Paths.get(s"$outDir/_graft_sweep_intent"),
      intentLines.mkString("", "\n", "\n"))

    assert(Retention.healInterruptedSweep(spark, outDir),
      "heal did not detect the committed intent")

    assert(partDirs(outDir) == Seq(part), "expiry/swap not completed by heal")
    assert(partFileCount(outDir, part) == 1)
    assert(!new java.io.File(s"$outDir/_graft_sweep_intent").exists())
    assert(!new java.io.File(aside).exists())
    val after = spark.read.parquet(outDir).collect().map(_.toString).sorted
    assert(after.toSeq == before.toSeq, "healed table lost or duplicated rows")

    // healing a healthy table is a no-op
    assert(!Retention.healInterruptedSweep(spark, outDir))
  }

  test("log-rewrite crash window: orphan manifest tmp is restored before the replay") {
    val dir = Files.createTempDirectory("graft_retention_logtmp").toString
    val outDir = s"$dir/out"
    runSink(dir, Seq(
      Seq(wire("a1", "2024-01-10T10:00:00Z"), wire("b1", "2024-01-20T10:00:00Z")),
      Seq(wire("b2", "2024-01-20T11:00:00Z"))))
    val before = spark.read.parquet(outDir)
      .filter(org.apache.spark.sql.functions.col("event_date") >= "2024-01-15")
      .collect().map(_.toString).sorted

    // crash state: committed intent + aside (as in the heal test), PLUS a
    // manifest log file caught mid-rewrite — deleted, its content
    // surviving only as <name>.graft-tmp (writeFileAtomic's delete/rename
    // window). The heal must restore the log file before filtering, or
    // that batch's entries vanish from the manifest.
    val part = "event_date=2024-01-20"
    val aside = s"$outDir/$part.compact"
    spark.read.parquet(s"$outDir/$part").coalesce(1).write.parquet(aside)
    val files = new java.io.File(aside).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    Files.writeString(Paths.get(s"$outDir/_graft_sweep_intent"),
      (Seq("v1", "expired=event_date=2024-01-10", s"compact=$part") ++
        files.map(f => s"file=$part|${f.getName}|${f.length}|${f.lastModified}"))
        .mkString("", "\n", "\n"))
    val log0 = Paths.get(s"$outDir/_spark_metadata/0")
    Files.move(log0, Paths.get(s"$outDir/_spark_metadata/0.graft-tmp"))

    assert(Retention.healInterruptedSweep(spark, outDir))
    assert(!new java.io.File(s"$outDir/_spark_metadata/0.graft-tmp").exists())
    assert(new java.io.File(s"$outDir/_spark_metadata/0").exists())
    val after = spark.read.parquet(outDir).collect().map(_.toString).sorted
    assert(after.toSeq == before.toSeq,
      "manifest lost a batch's entries across the log-rewrite crash window")
  }
}
