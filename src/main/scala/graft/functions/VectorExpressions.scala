package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of two ARRAY<FLOAT> columns, accumulated in double
  * left-to-right (same summation order as `aggregate(zip_with(...))`, so
  * results are bit-identical to the composed-builtin form and to a
  * sequential oracle).
  *
  * Why native: Spark's higher-order functions interpret the lambda per
  * element (one function call + boxing per product). At ~2M candidate
  * pairs × 64 dims × 3 dots per cosine, that interpretation dominated the
  * benchmark; this expression is a tight codegen'd loop over the unsafe
  * array data instead. Mismatched lengths yield NULL.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_vec_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature, packed into a long bitmask: bit i is
  * the sign of the projection of the vector onto pseudo-random hyperplane
  * i, whose components are ±1 derived from a splitmix of (plane, dim) —
  * reproducible everywhere with no stored model. nBits ≤ 64.
  *
  * Native for the same reason as [[FloatVecDot]]: the composed form ran
  * nBits × dim interpreted lambda steps (plus a seeded hash each) per
  * vector; this is one codegen'd double loop, and the packed long turns
  * downstream band extraction into bit shifts instead of array slices.
  */
case class RhpSig(child: Expression, nBits: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(nBits > 0 && nBits <= 64, "nBits must be in 1..64")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "rhp_sig"

  protected override def nullSafeEval(input: Any): Any =
    RhpSig.compute(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RhpSig$$.MODULE$$.compute($c, $nBits);")

  override protected def withNewChildInternal(newChild: Expression): RhpSig =
    copy(child = newChild)
}

object RhpSig {
  /** splitmix64 finalizer — the per-(plane,dim) pseudo-random sign. */
  private def mix(z0: Long): Long = {
    var z = z0 + -7046029254386353131L
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z ^ (z >>> 31)
  }

  def compute(emb: ArrayData, nBits: Int): Long = {
    val dim = emb.numElements()
    var sig = 0L
    var i = 0
    while (i < nBits) {
      var s = 0.0
      var j = 0
      while (j < dim) {
        val sign = if (mix(i.toLong * 131071L + j) >= 0L) 1.0 else -1.0
        s += emb.getFloat(j).toDouble * sign
        j += 1
      }
      if (s >= 0.0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

object VectorFunctions {
  /** Column API for [[FloatVecDot]]. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(FloatVecDot(Bridge.expression(a), Bridge.expression(b)))

  /** Column API for [[RhpSig]]. */
  def rhpSig(emb: Column, nBits: Int): Column =
    Bridge.column(RhpSig(Bridge.expression(emb), nBits))
}
