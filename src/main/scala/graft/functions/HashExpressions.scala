package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sketch primitives over pre-hashed token/shingle arrays (ARRAY<BIGINT>,
  * e.g. `transform(shingles, s -> xxhash64(s))`).
  *
  * Both are single-pass, codegen'd loops. The composed-builtin forms
  * (k× `array_min(transform(...))`, 64× `aggregate(...)`) re-walk the
  * array k/64 times through the interpreted lambda machinery — at
  * corpus scale that interpretation was ~95% of the dedup benchmark.
  */

/** k-permutation MinHash signature: sig[j] = min over hashes h of
  * (h * A_j + B_j), with A_j/B_j derived from golden-ratio constants
  * (deterministic across runs, partitions and cluster sizes — no stored
  * model). Empty array → all Long.MaxValue.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k > 0, "k must be positive")

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig$$.MODULE$$.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** 0x9E3779B97F4A7C15 / 0xBF58476D1CE4E5B9 (splitmix64 constants). */
  val GoldenA: Long = -7046029254386353131L
  val GoldenB: Long = -4658895280553007687L

  def compute(arr: ArrayData, k: Int): UnsafeArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = (2L * j + 1L) * GoldenA
      val b = j * GoldenB
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val g = arr.getLong(i) * a + b
        if (g < m) m = g
        i += 1
      }
      mins(j) = m
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** 64-bit SimHash over pre-hashed features: bit j of the result is set
  * iff the majority of feature hashes have bit j set (strictly more set
  * than unset — identical to the ±1-sum > 0 formulation).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) cnt(j) += 1 else cnt(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (cnt(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Polynomial rolling hash of a string's code points:
  * h = fold(0, cp -> (h * base + cp) mod m). The same fold DuckDB writes as
  * `list_reduce(list_prepend(0, list_transform(string_split(s,''), c ->
  * ord(c))), (a,b) -> (a*base+b) % m)` — the cross-engine-replicable hash
  * family proven by q_rolling_fingerprint, packaged as a codegen'd loop so
  * per-shingle hashing doesn't pay the interpreted-HOF tax.
  *
  * Constraint: the worst fold step (mod-1)*base + maxCodePoint must fit
  * in a signed 64-bit long — enforced at construction (for base 131 that
  * admits mod up to ~7.0e16; the replicable family uses primes near
  * 2^30, far inside the bound).
  */
case class PolyHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  // worst step is h*base + cp with h ≤ mod-1 and cp ≤ 0x10FFFF — the
  // whole bound must fit in a long or hashes silently wrap negative
  require(mod > 0 && base > 0 &&
    (mod - 1) <= (Long.MaxValue - 0x10FFFFL) / base,
    "(mod-1)*base + max code point must fit in a long")

  override def inputTypes = Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  protected override def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash$$.MODULE$$.compute($c, ${base}L, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  def compute(s: org.apache.spark.unsafe.types.UTF8String, base: Long, mod: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** The whole-array form of the replicable shingle hash: for each string,
  * BOTH polynomial hashes (31 mod 1e9+7; 131 mod 1e9+9) in a single
  * code-point scan, packed as h1 | h2 << 30 — a 60-bit non-negative long.
  *
  * Why a dedicated array expression: `transform(arr, s -> poly(..) +
  * poly(..) * 2^30)` pays the interpreted-lambda machinery per element
  * plus TWO string scans; this is one codegen'd eval per ROW and one scan
  * per string (measured: q_simhash_pairs 3.3 s → the round-1 2.3 s level).
  * Null elements hash to 0 (shingle arrays never contain nulls).
  */
case class PolyHashArray(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_hash_array"

  protected override def nullSafeEval(input: Any): Any =
    PolyHashArray.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHashArray$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PolyHashArray =
    copy(child = newChild)
}

object PolyHashArray {
  private val Mod1 = 1000000007L
  private val Mod2 = 1000000009L
  // The h1 | (h2 << 30) pack is collision-free ONLY because both moduli
  // fit in 30 bits, keeping the bit ranges disjoint — the DuckDB twin
  // (q_simhash_pairs computes h1 + h2*2^30) and the 60-bit SimHash claim
  // both depend on this invariant.
  require(Mod1 <= (1L << 30) && Mod2 <= (1L << 30),
    s"PolyHashArray pack requires both moduli <= 2^30 (got $Mod1, $Mod2)")

  def compute(arr: ArrayData): UnsafeArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) 0L else {
        val str = arr.getUTF8String(i).toString
        var h1 = 0L
        var h2 = 0L
        var j = 0
        val len = str.length
        while (j < len) {
          val cp = str.codePointAt(j)
          h1 = (h1 * 31L + cp) % Mod1
          h2 = (h2 * 131L + cp) % Mod2
          j += Character.charCount(cp)
        }
        h1 | (h2 << 30)
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object HashFunctions {
  def minhashSig(hashes: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(hashes), k))
  def simhash64(hashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(hashes)))
  def polyHash(s: Column, base: Long, mod: Long): Column =
    Bridge.column(PolyHash(Bridge.expression(s), base, mod))
  def polyHashArray(arr: Column): Column =
    Bridge.column(PolyHashArray(Bridge.expression(arr)))
}
