package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for graft's native expressions.
  *
  * Two registration paths:
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (cluster-wide, survives session cloning);
  *  - runtime: `GraftExtensions.register(spark)` on an existing session.
  *
  * Registered functions (usable from `spark.sql` / `expr`):
  *   float_vec_dot(a, b)      dot product of ARRAY<FLOAT>
  *   rhp_sig(emb, nBits)      packed random-hyperplane LSH signature
  *   minhash_sig(hashes, k)   k-permutation MinHash signature
  *   simhash64(hashes)        64-bit majority SimHash
  *   word_shingles(toks, n)   distinct word n-grams
  *   quality_score(user_id, message, value, ts)
  *                            the reference's 0-100 event quality score
  *   poly_hash(s, base, mod)  cross-engine-replicable rolling hash
  *   poly_hash_array(arr)     packed dual poly hash per array element
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    // whole-operator optimizer extension: the bin-bucketed range-join
    // rewrite (conf-gated — inert until spark.graft.rangeJoin.binSize
    // is set; see graft.plans.RangeJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule())
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private[functions] val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "float_vec_dot" -> (es => FloatVecDot(es(0), es(1))),
    "rhp_sig" -> (es => RhpSig(es(0), intArg(es(1), "nBits"))),
    "minhash_sig" -> (es => MinHashSig(es(0), intArg(es(1), "k"))),
    "simhash64" -> (es => SimHash64(es(0))),
    "word_shingles" -> (es => WordShingles(es(0), intArg(es(1), "n"))),
    "quality_score" -> (es => qualityScoreExpr(es(0), es(1), es(2), es(3))),
    "poly_hash" -> (es => PolyHash(es(0), longArg(es(1), "base"), longArg(es(2), "mod"))),
    "poly_hash_array" -> (es => PolyHashArray(es(0)))
  )

  private def longArg(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  /** The §2.3-P9 scoring formula as a single SQL-callable function —
    * the same semantics as EventPipeline.qualityScore, built from raw
    * catalyst nodes (a Column-DSL round-trip would leave unresolved
    * ColumnNode wrappers inside an already-analyzed tree).
    */
  private def qualityScoreExpr(
      userId: Expression, message: Expression,
      value: Expression, ts: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{IntegerType, StringType}
    def cond(c: Expression): Expression = If(c, Literal(25), Literal(0))
    def nonEmpty(e: Expression): Expression =
      And(IsNotNull(e), Not(EqualTo(e, Literal(""))))
    val c1 = cond(And(nonEmpty(userId), Not(EqualTo(userId, Literal("unknown")))))
    val c2 = cond(nonEmpty(message))
    val c3 = cond(GreaterThan(value, Literal(0.0)))
    val c4 = cond(And(IsNotNull(ts), Not(EqualTo(Cast(ts, StringType), Literal("")))))
    Cast(Add(Add(c1, c2), Add(c3, c4)), IntegerType)
  }

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
