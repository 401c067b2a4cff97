package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType}

/** RANGE-JOIN OPTIMIZATION — the whole-operator rewrite OSS Spark lacks
  * (Catalyst plans a join whose only condition is an interval
  * containment `p.v BETWEEN i.lo AND i.hi` as a BroadcastNestedLoopJoin
  * or a cartesian product: every point row is tested against every
  * interval row, O(|P|·|I|) comparisons — the first thing that dies
  * when either side outgrows toy scale).
  *
  * The rewrite is the standard bin-bucketing decomposition:
  *
  *   1. pick a bin width `b` (session conf, see [[RangeJoinRule.BinSizeKey]]);
  *   2. point side gains one row-local column  bin(v)  = ⌊v / b⌋;
  *   3. interval side EXPLODES to one row per covered bin
  *      (sequence(⌊lo/b⌋ … ⌊hi/b⌋) — row-local, ≤ (hi−lo)/b + 1 rows);
  *   4. join becomes an EQUI-join on the bin key with the ORIGINAL
  *      range predicate kept as the residual filter;
  *   5. a final projection restores the original output columns.
  *
  * Correctness: ⌊·/b⌋ is monotone, so lo ≤ v ≤ hi implies
  * ⌊lo/b⌋ ≤ ⌊v/b⌋ ≤ ⌊hi/b⌋ — every qualifying pair shares exactly ONE
  * bin (the point's), so no match is lost and none duplicates; the
  * residual keeps the exact semantics (strict/non-strict bounds, null
  * bounds never match — a null sequence bound explodes to zero rows,
  * exactly the rows an inner join drops anyway). The rewrite is
  * therefore semantics-preserving for ANY numeric types: binning casts
  * through DOUBLE, and a monotone lossy cast still satisfies the
  * coverage inequality even where it collapses distinct values into
  * one bin (extra candidate pairs only — the residual rejects them).
  *
  * Scale shape: the quadratic compare collapses to hash-partitioned
  * equi-join work proportional to Σ per-bin |P_bin|·|I_bin| — at 100 TB
  * the two sides shuffle ONCE on the bin key and AQE's skew handling
  * composes (a hot bin is an ordinary hot equi-join key). Bin width is
  * the caller's knob: ~the typical interval length is optimal (≤ 2 bins
  * per interval, point side never inflates).
  *
  * Activation: ONLY when `spark.graft.rangeJoin.binSize` is set
  * (positive double) AND the join is INNER with a pure range condition
  * — any equality conjunct means Catalyst already has a hash key and
  * the rule stands down. Registered by `graft.functions.GraftExtensions`
  * (config path) or `RangeJoinRule.register(spark)` (runtime path, via
  * `spark.experimental.extraOptimizations`). The rule is idempotent:
  * its own output contains an equality conjunct, so the fixed-point
  * batch fires it at most once per join.
  */
case class RangeJoinRule() extends Rule[LogicalPlan] {

  import RangeJoinRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val binSize = conf.getConfString(BinSizeKey, "")
    if (binSize.isEmpty) return plan
    val b = binSize.toDouble
    require(b > 0, s"$BinSizeKey must be positive, got $binSize")
    val pointCol = conf.getConfString(PointColumnKey, "")
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if eligible(j, cond) =>
        extractRange(cond, left, right, pointCol) match {
          case Some(RangeSides(point, lo, hi, pointIsLeft)) =>
            val (pointPlan, intervalPlan) =
              if (pointIsLeft) (left, right) else (right, left)
            // 2. point bin: one row-local column
            val pBin = Alias(binOf(point, b), "__graft_pbin")()
            val pointProj = Project(pointPlan.output :+ pBin, pointPlan)
            // 3. interval side explodes to its covered bins. An
            // INVERTED interval (lo > hi — garbage data) must explode
            // to ZERO rows exactly as the naive inner join matches
            // nothing; a bare Sequence would THROW on start > stop,
            // turning bad rows into a job failure the original query
            // never had. (A null bound makes Sequence null and
            // Explode drops the row — already inner-join-faithful.)
            val loBin = binOf(lo, b)
            val hiBin = binOf(hi, b)
            val seq = If(
              LessThanOrEqual(loBin, hiBin),
              Sequence(loBin, hiBin, Some(Literal(1L)),
                Some(SQLConf.get.sessionLocalTimeZone)),
              Literal.create(null, org.apache.spark.sql.types.ArrayType(LongType)))
            val iBin = AttributeReference("__graft_ibin", LongType)()
            val intervalGen = Generate(
              Explode(seq), unrequiredChildIndex = Nil, outer = false,
              qualifier = None, generatorOutput = Seq(iBin), intervalPlan)
            // 4. equi-join on the bin, original range as residual
            val newCond = And(EqualTo(pBin.toAttribute, iBin), cond)
            val (newLeft, newRight) =
              if (pointIsLeft) (pointProj, intervalGen)
              else (intervalGen, pointProj)
            // 5. restore the original output
            Project(j.output,
              Join(newLeft, newRight, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }

  /** Inner join whose condition contains range comparisons and NO
    * equality conjunct (an equality gives Catalyst a hash key already —
    * the range is then a cheap residual and this rewrite would only add
    * work). Also skip self-referencing conditions a bin key can't help.
    */
  private def eligible(j: Join, cond: Expression): Boolean = {
    val conjuncts = splitConjuncts(cond)
    conjuncts.nonEmpty && !conjuncts.exists {
      case EqualTo(_, _) | EqualNullSafe(_, _) => true
      case _ => false
    }
  }
}

object RangeJoinRule {

  /** Bin width for the range-join rewrite; unset (default) disables the
    * rule. Set it to roughly the TYPICAL interval length: an interval
    * then covers ≤ 2 bins and the explode inflation is bounded by 2×.
    */
  val BinSizeKey = "spark.graft.rangeJoin.binSize"

  /** Optional point-column scope: when set, the rule rewrites ONLY
    * joins whose point side is an attribute with this exact name. A
    * bin width tuned for one domain (an hour of microseconds) is a
    * landmine in another — a session-wide binSize once rewrote an
    * unrelated stats-interval join into a 2.5-billion-element bin
    * sequence. A query that leaves the confs set for its execution
    * MUST scope them to its own point column; the unscoped form is for
    * sessions that run one range-join workload.
    */
  val PointColumnKey = "spark.graft.rangeJoin.pointColumn"

  /** Runtime registration on an existing session (the config path is
    * `spark.sql.extensions=graft.functions.GraftExtensions`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[RangeJoinRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRule()

  private[plans] case class RangeSides(
      point: Expression, lo: Expression, hi: Expression, pointIsLeft: Boolean)

  private[plans] def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** ⌊cast(e as double) / b⌋ as LONG — monotone in e for b > 0, which is
    * the only property the rewrite needs (see class doc).
    */
  private[plans] def binOf(e: Expression, b: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(b)))

  /** Find a (point ≥/> lo, point ≤/< hi) pair where the point expression
    * references exactly one join side and both bounds reference only the
    * other. Comparisons are normalized so the point lands on the left.
    * A non-empty `pointCol` additionally requires the point to be an
    * attribute with that name (the [[PointColumnKey]] scope).
    */
  private[plans] def extractRange(
      cond: Expression,
      left: LogicalPlan,
      right: LogicalPlan,
      pointCol: String = ""): Option[RangeSides] = {
    val conjuncts = splitConjuncts(cond)
    // (point, bound, isLower) triples, point normalized to first position
    val cmps: Seq[(Expression, Expression, Boolean)] = conjuncts.flatMap {
      case GreaterThanOrEqual(a, c) => Seq((a, c, true), (c, a, false))
      case GreaterThan(a, c) => Seq((a, c, true), (c, a, false))
      case LessThanOrEqual(a, c) => Seq((a, c, false), (c, a, true))
      case LessThan(a, c) => Seq((a, c, false), (c, a, true))
      case _ => Nil
    }
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    def numeric(e: Expression): Boolean =
      e.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    def inScope(e: Expression): Boolean = pointCol.isEmpty || (e match {
      case a: Attribute => SQLConf.get.resolver(a.name, pointCol)
      case _ => false
    })
    val candidates = for {
      (p1, lo, isLo) <- cmps if isLo
      (p2, hi, isHi) <- cmps if !isHi
      if p1.semanticEquals(p2) && numeric(p1) && numeric(lo) && numeric(hi)
      if inScope(p1)
      pSide <- sideOf(p1)
      loSide <- sideOf(lo) if loSide != pSide
      hiSide <- sideOf(hi) if hiSide != pSide
    } yield RangeSides(p1, lo, hi, pointIsLeft = pSide)
    candidates.headOption
  }
}
