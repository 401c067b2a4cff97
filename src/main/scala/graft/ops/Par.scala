package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Scan-parallelism floor for COMPUTE-DENSE operator inputs (optimization
  * guide §2.5 "input skew — repartition immediately after the read").
  *
  * The sandbox testdata ships each table as ONE parquet file with ONE row
  * group, and a single row group cannot split across scan tasks — so an
  * operator whose work per input byte is enormous (all-pairs scoring,
  * shingle explodes, per-row JSON parse chains) runs its hot stage on ONE
  * task while the other cores idle; stage-level profiling
  * (graft.tools.Profile, round 12) measured 4.9 s single-task stages
  * under q_hubness and 7.1 s under q_fuzzy_join at sf0.1/local[32].
  *
  * Applied AT THE OPERATOR, never in the base readers: a round-12
  * experiment that widened every reader fixed those operators but taxed
  * the other ~300 scan-light aggregate queries ~0.5 s each (extra
  * exchange + extra 32-task stages per query, +31 s suite net on the
  * events family alone) — the knowledge "this operator's compute dwarfs
  * its input bytes" lives at the call site (guide §8), so only those
  * call sites pay for parallelism. At the 100 TB target the same scans
  * carry thousands of row groups and this helper must do NOTHING — hence:
  *
  *  - the floor is the session's `defaultParallelism` (overridable via
  *    `spark.graft.minScanParallelism`), never a constant;
  *  - a scan that already has at least that many partitions is returned
  *    UNCHANGED (the any-real-scale case — the check is on the scan's
  *    actual partition count, cached per (session, path));
  *  - the repartition hashes the table's primary key — deterministic
  *    under task retry (guide §2.5 rejects rand-derived keys) and
  *    sort-free (a keyless round-robin repartition pays a full local
  *    sort for retry determinism, SPARK-23207);
  *  - `spark.graft.minScanParallelism=1` disables it, which is how
  *    plan-shape tests assert the at-scale (no extra exchange) shape.
  */
private[graft] object Par {

  val MinScanParallelismKey = "spark.graft.minScanParallelism"

  /** Scan partition counts, cached per (session, cacheKey): the count
    * costs a physical planning pass (no job), and the hot operator sites
    * are invoked many times per Bench/Verify session on the same handful
    * of source paths.
    */
  private val scanParts =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Int]

  /** `df` MUST be exchange-free (a scan, optionally filtered/projected):
    * the partition-count probe plans `df.rdd`, which on a frame with
    * exchanges could trigger adaptive stage execution. Pass a stable
    * `cacheKey` (e.g. the source path) to memoize the probe.
    */
  def widen(df: DataFrame, key: Column, cacheKey: String = ""): DataFrame = {
    val sess = df.sparkSession
    val target = sess.conf.getOption(MinScanParallelismKey).map(_.toInt)
      .getOrElse(sess.sparkContext.defaultParallelism)
    if (target <= 1) df
    else {
      scanParts.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
      def probe() = df.rdd.getNumPartitions
      val parts =
        if (cacheKey.isEmpty) probe()
        else scanParts.getOrElseUpdate((sess, cacheKey), probe())
      if (parts >= target) df else df.repartition(target, key)
    }
  }
}
