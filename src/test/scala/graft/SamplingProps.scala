package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** ScalaCheck properties for the systematic-sampling copy arithmetic
  * (the pure kernel behind `Corpus.systematicSample`, mirrored here in
  * BigInt exactly as the Spark side widens to DECIMAL(38,0)). The Spark
  * plumbing — hierarchical prefix sum, shard invariance — is pinned in
  * CorpusSpec; this sweeps the arithmetic across the weight space,
  * including zero-weight docs and weights far beyond any one doc's
  * fair share.
  */
object SamplingProps extends Properties("SystematicSampling") {

  private val weights: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.oneOf(
      Gen.choose(0L, 5L),              // tiny docs + zero-token docs
      Gen.choose(0L, 100000L),         // typical spread
      Gen.choose(1000000000L, 2000000000L))) // whales
  private val ks: Gen[Long] = Gen.choose(1L, 100000L)

  private def copies(ws: List[Long], k: Long): List[BigInt] = {
    val w = ws.map(BigInt(_))
    val total = w.sum
    val cums = w.scanLeft(BigInt(0))(_ + _)
    cums.sliding(2).map { case Seq(a, b) => b * k / total - a * k / total }
      .toList
  }

  property("floors telescope: exactly k copies drawn, never negative") =
    forAll(weights, ks) { (ws, k) =>
      (ws.sum > 0) ==> {
        val cs = copies(ws, k)
        Prop(cs.sum == BigInt(k)) && Prop(cs.forall(_ >= 0))
      }
    }

  property("proportionality: each doc gets ⌊w·k/W⌋ or ⌊w·k/W⌋+1 copies") =
    forAll(weights, ks) { (ws, k) =>
      (ws.sum > 0) ==> {
        val total = BigInt(ws.sum)
        copies(ws, k).zip(ws).forall { case (c, w) =>
          val fair = BigInt(w) * k / total
          c == fair || c == fair + 1
        }
      }
    }

  property("zero-weight docs are never drawn; ≥W/k weight always is") =
    forAll(weights, ks) { (ws, k) =>
      (ws.sum > 0) ==> {
        val total = BigInt(ws.sum)
        copies(ws, k).zip(ws).forall { case (c, w) =>
          (w != 0L || c == 0) && (BigInt(w) * k < total || c >= 1)
        }
      }
    }
}
