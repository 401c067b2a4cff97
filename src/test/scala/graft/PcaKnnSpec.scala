package graft

import org.apache.spark.sql.functions._
import graft.ops.{Similarity, TextAnalysis}

/** Round-9 additions: k-NN weak labeling, the distributed-PCA
  * covariance pass, and the per-source diversity / Zipf-fit text
  * statistics.
  */
class PcaKnnSpec extends SparkTestBase {
  import spark.implicits._

  // three axis-aligned clusters with labels 0/1/2
  private lazy val labeled = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f, 0.0f), 0),
    (3L, Array(0.0f, 1.0f, 0.0f), 1),
    (4L, Array(0.1f, 0.9f, 0.0f), 1),
    (5L, Array(0.0f, 0.0f, 1.0f), 2),
    (6L, Array(0.0f, 0.1f, 0.9f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("knnClassify: majority label of the nearest cluster wins") {
    val queries = Seq(
      (100L, Array(0.95f, 0.05f, 0.0f), -1),
      (101L, Array(0.0f, 0.0f, 0.95f), -1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(labeled, queries, k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("predicted_label")))
      .toSeq
    // query 100 sits on the x-axis: neighbors 1,2 (label 0) dominate k=3
    // query 101 sits on the z-axis: neighbors 5,6 (label 2) dominate
    assert(out == Seq((100L, 0L), (101L, 2L)))
  }

  test("knnClassify: vote tie broken by best (lowest) neighbor rank") {
    // query (1,1,0): vectors 2 (0.9,0.1,0) and 4 (0.1,0.9,0) tie at the
    // SAME cosine (commutative double sums), so the cosine tie falls to
    // vec_id → v2 rank 1 (label 0), v4 rank 2 (label 1); k=2 gives one
    // vote each and the winner must be the rank-1 neighbor's label
    val queries = Seq((100L, Array(1.0f, 1.0f, 0.0f), -1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(labeled, queries, k = 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("votes") == 1L)
    assert(r.getAs[Long]("best_rnk") == 1L)
    assert(r.getAs[Long]("predicted_label") == 0L)
  }

  private lazy val tiny = Seq(
    Tuple1(Array(1.0f, 2.0f)),
    Tuple1(Array(3.0f, 4.0f)),
    Tuple1(Array(5.0f, 6.0f))
  ).toDF("embedding")

  test("covarianceMatrix matches the hand-computed Gram pass") {
    // dims are perfectly correlated (x₂ = x₁ + 1):
    // var = ((−2)² + 0 + 2²)/3 = 8/3 for both dims and the cross term
    val out = Similarity.covarianceMatrix(tiny, dim = 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exp = BigDecimal(8.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Map((0L, 0L) -> exp, (0L, 1L) -> exp, (1L, 1L) -> exp))
  }

  test("pcaVariance: variances match the covariance diagonal, shares sum to 1") {
    val rows = Similarity.pcaVariance(tiny).collect()
    assert(rows.map(_.getAs[Long]("dim")).toSeq == Seq(0L, 1L))
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("variance") - 8.0 / 3) < 1e-5)
      assert(math.abs(r.getAs[Double]("var_share") - 0.5) < 1e-5)
    }
    assert(rows.head.getAs[Double]("mean") == 3.0)
  }

  test("pcaTopComponent: perfectly correlated dims give the diagonal direction") {
    val (lambda, v) = Similarity.pcaTopComponent(tiny, dim = 2)
    // cov = [[8/3, 8/3], [8/3, 8/3]] → λ = 16/3, v = (1,1)/√2
    assert(math.abs(lambda - 16.0 / 3) < 1e-6)
    assert(math.abs(math.abs(v(0)) - 1 / math.sqrt(2)) < 1e-6)
    assert(math.abs(v(0) - v(1)) < 1e-9)
  }

  private lazy val docs = Seq(
    // source A: two docs sharing all their trigrams (templated)
    (1L, "one two three four", "en", "A"),
    (2L, "one two three four", "en", "A"),
    // source B: fully distinct trigrams
    (3L, "alpha beta gamma delta", "en", "B")
  ).toDF("doc_id", "text", "lang", "source")

  test("ngramDiversity: templated source scores low, diverse source 10000") {
    val out = TextAnalysis.ngramDiversity(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("total_trigrams"), r.getAs[Long]("distinct_trigrams"),
          r.getAs[Long]("diversity_e4"))).toMap
    // A: each doc has 2 distinct trigrams, both shared → 4 total, 2 distinct
    assert(out("A") == ((4L, 2L, 5000L)))
    assert(out("B") == ((2L, 2L, 10000L)))
  }

  test("tokenEntropy: uniform two-term source hits ln 2, normalized 1") {
    val one = Seq((1L, "a a b b", "en", "Z")).toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.tokenEntropy(one).collect().head
    assert(r.getAs[Long]("vocab_size") == 2L)
    assert(r.getAs[Long]("total_tokens") == 4L)
    assert(math.abs(r.getAs[Double]("entropy") - math.log(2.0)) < 1e-3)
    assert(r.getAs[Double]("norm_entropy") == 1.0)
  }

  test("labelSilhouette: separated clusters score near 1, a straddling label scores lower") {
    import graft.ops.Similarity
    val vecs = Seq(
      // label 0: tight cluster on +x      label 1: tight cluster on +y
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.1f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.0f, 1.1f), 1),
      // label 2 straddles both clusters → poor coherence
      (5L, Array(0.9f, 0.1f), 2), (6L, Array(0.1f, 0.9f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelSilhouette(vecs, dim = 2).collect()
      .map(r => r.getAs[Long]("label") -> r.getAs[Double]("mean_silhouette")).toMap
    assert(out(0L) > 0.5 && out(1L) > 0.5, out.toString)
    assert(out(2L) < out(0L) && out(2L) < out(1L), out.toString)
  }

  test("logisticQuality: diverse stopword-bearing prose outscores a repeated token") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog of the meadow and then rests", "en", "A"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam", "en", "A")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.logisticQuality(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_e4")).toMap
    assert(out(1L) > out(2L), out.toString)
  }

  test("trainQualityWeights: distributed GD separates planted classes") {
    // positives: diverse 12-token prose; negatives: one token repeated
    val docs = (0 until 20).map { i =>
      (i.toLong, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i iota$i kappa$i lambda$i mu$i", "en", "A")
    } ++ (20 until 40).map { i =>
      (i.toLong, Seq.fill(12)(s"dup$i dup$i").mkString(" "), "en", "A")
    }
    val df = docs.toDF("doc_id", "text", "lang", "source")
    val w = TextAnalysis.trainQualityWeights(df, col("doc_id") < 20, iters = 40)
    val scored = TextAnalysis.logisticQuality(df, w).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_e4")).toMap
    val posMin = (0 until 20).map(i => scored(i.toLong)).min
    val negMax = (20 until 40).map(i => scored(i.toLong)).max
    assert(posMin > negMax,
      s"trained model fails to separate: posMin=$posMin negMax=$negMax w=$w")
  }

  test("pmiCollocations: an exclusive pair tops independent co-occurrences") {
    // "new york" appears 6 times and its tokens appear nowhere else;
    // "of the" also appears 6 times but both tokens are everywhere
    val filler = "of the kind of the sort of the way"
    val docs = (0 until 6).map(i =>
      (i.toLong, s"new york $filler trip$i", "en", "A"))
    val out = TextAnalysis.pmiCollocations(
      docs.toDF("doc_id", "text", "lang", "source"), minCount = 5, k = 10).collect()
    val top = out.head
    assert((top.getAs[String]("x"), top.getAs[String]("y")) == (("new", "york")))
    assert(top.getAs[Long]("c_xy") == 6L)
    // every returned pair met the count floor
    assert(out.forall(_.getAs[Long]("c_xy") >= 5L))
  }

  test("zipfSlope: counts ∝ 1/rank fit slope −1 exactly") {
    // counts 12, 6, 4, 3 at ranks 1..4 → ln(cnt) = ln 12 − ln(rank)
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val one = Seq((1L, text, "en", "Z")).toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.zipfSlope(one, topN = 4).collect().head
    assert(r.getAs[Long]("n_terms") == 4L)
    assert(r.getAs[Double]("zipf_slope") == -1.0)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(12.0)) < 1e-3)
  }
}
