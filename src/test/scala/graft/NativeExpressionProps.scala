package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{RhpSig, WordShingles}

/** ScalaCheck properties for the native expressions' kernels — exercised
  * directly on catalyst ArrayData (no Spark session, pure JVM), so the
  * whole space of inputs is cheap to sweep.
  */
object NativeExpressionProps extends Properties("NativeExpressions") {

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)

  private def utf8Array(tokens: Seq[String]): GenericArrayData =
    new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])

  property("shingles: count ≤ max(0, n-k+1), each has exactly k tokens") =
    forAll(Gen.listOf(token), Gen.choose(1, 5)) { (toks, k) =>
      val out = WordShingles.compute(utf8Array(toks), k)
      val shingles = (0 until out.numElements())
        .map(i => out.getUTF8String(i).toString)
      val bound = math.max(0, toks.length - k + 1)
      Prop(shingles.length <= bound) &&
        Prop(shingles.distinct.length == shingles.length) &&
        Prop(shingles.forall(_.split(" ", -1).length == k))
    }

  property("shingles: every shingle occurs contiguously in the input") =
    forAll(Gen.listOf(token), Gen.choose(1, 4)) { (toks, k) =>
      val out = WordShingles.compute(utf8Array(toks), k)
      val joined = toks.mkString(" ")
      (0 until out.numElements()).forall { i =>
        joined.contains(out.getUTF8String(i).toString)
      }
    }

  property("shingles with k=1 equal the distinct tokens in order") =
    forAll(Gen.listOf(token)) { toks =>
      val out = WordShingles.compute(utf8Array(toks), 1)
      val got = (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
      got == toks.distinct
    }

  private val hashes: Gen[List[Long]] = Gen.listOf(Gen.long)

  property("minhash: adding an element never raises any signature slot") =
    forAll(hashes, Gen.long, Gen.choose(1, 32)) { (hs, extra, k) =>
      val sigA = graft.functions.MinHashSig.compute(
        new GenericArrayData(hs.toArray), k)
      val sigB = graft.functions.MinHashSig.compute(
        new GenericArrayData((extra :: hs).toArray), k)
      (0 until k).forall(j => sigB.getLong(j) <= sigA.getLong(j))
    }

  property("minhash: order-insensitive (set semantics)") =
    forAll(hashes, Gen.choose(1, 16)) { (hs, k) =>
      val a = graft.functions.MinHashSig.compute(
        new GenericArrayData(hs.toArray), k)
      val b = graft.functions.MinHashSig.compute(
        new GenericArrayData(hs.reverse.toArray), k)
      (0 until k).forall(j => a.getLong(j) == b.getLong(j))
    }

  private val floats: Gen[Array[Float]] =
    Gen.chooseNum(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray))

  property("rhp signature: scaling a vector by a positive factor is invariant") =
    forAll(floats, Gen.chooseNum(0.1f, 8.0f)) { (v, c) =>
      val a = RhpSig.compute(new GenericArrayData(v.map(x => x: Any)), 16)
      val b = RhpSig.compute(new GenericArrayData(v.map(x => x * c: Any)), 16)
      a == b
    }

  private val anyStr: Gen[String] = Gen.listOf(Gen.choose(32, 0x2FFF).map(_.toChar)).map(_.mkString)

  property("poly_hash_array ≡ per-string poly hashes packed h1 | h2<<30") =
    forAll(Gen.listOf(anyStr)) { strs =>
      val out = graft.functions.PolyHashArray.compute(utf8Array(strs))
      (0 until out.numElements()).forall { i =>
        val s = UTF8String.fromString(strs(i))
        val h1 = graft.functions.PolyHash.compute(s, 31L, 1000000007L)
        val h2 = graft.functions.PolyHash.compute(s, 131L, 1000000009L)
        val v = out.getLong(i)
        v == (h1 | (h2 << 30)) && v >= 0L && (v >> 60) == 0L
      }
    }
}
