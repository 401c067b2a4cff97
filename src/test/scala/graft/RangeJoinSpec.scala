package graft

import graft.plans.RangeJoinRule
import org.apache.spark.sql.DataFrame

/** The range-join optimizer rule: semantics preserved exactly, the
  * quadratic nested-loop plan replaced by a bin-keyed equi-join.
  */
class RangeJoinSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  private def points = {
    import spark.implicits._
    Seq((1L, -7.5), (2L, -0.1), (3L, 0.0), (4L, 12.3), (5L, 99.9),
      (6L, 100.0), (7L, 250.0)).toDF("pid", "v")
  }

  private def intervals = {
    import spark.implicits._
    Seq((10L, -10.0, 0.0), (20L, 0.0, 50.0), (30L, 99.9, 100.0),
      (40L, 240.0, 260.0), (50L, 400.0, 500.0)).toDF("iid", "lo", "hi")
  }

  private def nullIntervals = {
    import spark.implicits._
    Seq((60L, Some(-10.0), Option.empty[Double]),
      (70L, Option.empty[Double], Some(50.0))).toDF("iid", "lo", "hi")
  }

  private def withRule[T](binSize: String)(body: => T): T = {
    RangeJoinRule.register(spark)
    spark.conf.set(RangeJoinRule.BinSizeKey, binSize)
    try body finally {
      spark.conf.unset(RangeJoinRule.BinSizeKey)
      spark.conf.unset(RangeJoinRule.PointColumnKey)
    }
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pure range join rewrites to a bin equi-join with identical rows") {
    val naive = rows(points.join(intervals,
      col("v") >= col("lo") && col("v") <= col("hi")))
    // ground truth, hand-checked: -7.5∈[-10,0], -0.1∈[-10,0], 0∈[-10,0],
    // 0∈[0,50], 12.3∈[0,50], 99.9∈[99.9,100], 100∈[99.9,100], 250∈[240,260]
    assert(naive == Set((1L, 10L), (2L, 10L), (3L, 10L), (3L, 20L),
      (4L, 20L), (5L, 30L), (6L, 30L), (7L, 40L)))
    withRule("10.0") {
      val opt = points.join(intervals,
        col("v") >= col("lo") && col("v") <= col("hi"))
      assert(rows(opt) == naive)
      val p = planOf(opt)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"range join still quadratic:\n$p")
      assert(p.contains("__graft_pbin") || p.contains("__graft_ibin"),
        s"bin key missing from the rewritten plan:\n$p")
    }
  }

  test("strict bounds keep their strictness through the residual") {
    withRule("10.0") {
      val strict = rows(points.join(intervals,
        col("v") > col("lo") && col("v") < col("hi")))
      // boundary matches drop: 0.0 vs [-10,0] & [0,50], 99.9/100 vs [99.9,100]
      assert(strict == Set((1L, 10L), (2L, 10L), (4L, 20L), (7L, 40L)))
    }
  }

  test("null interval bounds produce no matches (inner-join semantics)") {
    withRule("10.0") {
      val out = rows(points.join(nullIntervals,
        col("v") >= col("lo") && col("v") <= col("hi")))
      assert(out.isEmpty)
    }
  }

  test("an inverted interval (lo > hi) matches nothing instead of throwing") {
    import spark.implicits._
    // a bare sequence(start, stop) THROWS on start > stop — the rewrite
    // must keep the naive join's behavior: garbage rows match nothing
    val bad = Seq((80L, 50.0, -50.0), (90L, 0.0, 20.0))
      .toDF("iid", "lo", "hi")
    withRule("10.0") {
      val df = points.join(bad,
        col("v") >= col("lo") && col("v") <= col("hi"))
      assert(planOf(df).contains("__graft_pbin"), planOf(df))
      assert(rows(df) == Set((3L, 90L), (4L, 90L)))
    }
  }

  test("an equality conjunct stands the rule down (hash key already exists)") {
    withRule("10.0") {
      val df = points.join(intervals,
        col("pid") === col("iid") &&
          col("v") >= col("lo") && col("v") <= col("hi"))
      val p = planOf(df)
      assert(!p.contains("__graft_pbin"), s"rule fired needlessly:\n$p")
      df.collect()
    }
  }

  test("rule is inert without the conf (and with it unset afterwards)") {
    RangeJoinRule.register(spark)
    val p = planOf(points.join(intervals,
      col("v") >= col("lo") && col("v") <= col("hi")))
    assert(!p.contains("__graft_pbin"), s"rule fired without conf:\n$p")
  }

  test("BETWEEN through the SQL surface rewrites too") {
    withRule("1000.0") {
      points.createOrReplaceTempView("rj_points")
      intervals.createOrReplaceTempView("rj_intervals")
      val df = spark.sql(
        """SELECT pid, iid FROM rj_points JOIN rj_intervals
          |ON v BETWEEN lo AND hi""".stripMargin)
      assert(rows(df) == Set((1L, 10L), (2L, 10L), (3L, 10L), (3L, 20L),
        (4L, 20L), (5L, 30L), (6L, 30L), (7L, 40L)))
      val p = planOf(df)
      assert(p.contains("__graft_pbin") || p.contains("__graft_ibin"), p)
    }
  }

  test("register is idempotent") {
    RangeJoinRule.register(spark)
    RangeJoinRule.register(spark)
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[RangeJoinRule]) == 1)
  }

  test("pointColumn scope: the rule never touches another column's range join") {
    // the hazard this scope exists for: a binSize tuned for one domain
    // (an hour of microseconds) once exploded an UNRELATED query's
    // stats-interval join into a 2.5-billion-element bin sequence
    withRule("10.0") {
      spark.conf.set(RangeJoinRule.PointColumnKey, "t_us")
      val df = points.join(intervals,
        col("v") >= col("lo") && col("v") <= col("hi"))
      val p = planOf(df)
      assert(!p.contains("__graft_pbin"),
        s"rule fired on out-of-scope column v:\n$p")
      // matching column name (case-insensitive resolver) still rewrites
      val scoped = points.withColumnRenamed("v", "T_US")
        .join(intervals, col("T_US") >= col("lo") && col("T_US") <= col("hi"))
      assert(planOf(scoped).contains("__graft_pbin"), planOf(scoped))
    }
  }

  test("q_surge_windows executes through the rewrite — no nested-loop join") {
    val df = graft.ops.Intervals.surgeWindowTraffic(
      graft.ops.Analytics.events(spark, "/root/testdata/sf0.001"))
    try {
      // execute df's OWN QueryExecution (count() would build another)
      assert(df.collect().nonEmpty)
      val p = planOf(df)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"surge-window containment join still quadratic:\n$p")
      assert(p.contains("__graft_pbin") || p.contains("__graft_ibin"), p)
    } finally {
      spark.conf.unset(RangeJoinRule.BinSizeKey)
      spark.conf.unset(RangeJoinRule.PointColumnKey)
    }
  }
}
