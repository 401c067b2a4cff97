package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (5L, Array(1.0f, 0.0f, 0.0f, 0.0f)) // exact copy of 1
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with vec_id tiebreak") {
    val q = corpus.filter($"vec_id" === 1)
      .select($"vec_id", $"embedding")
    val out = Similarity.bruteForceTopK(corpus, q, k = 4).collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("neighbor_id")))
    // cos: v5=1.0, v2≈0.994, v3=0, v4=0 (tie → id order)
    assert(out.toSeq == Seq((1L, 5L), (2L, 2L), (3L, 3L), (4L, 4L)))
  }

  test("hybridSearch: RRF fusion is exact e9 arithmetic; both-lists doc tops a single-list doc") {
    // doc 3 is the only embedded document (semantic rank 1 guaranteed)
    // and also carries a query term, so its two RRF contributions beat
    // doc 1's single best-possible lexical contribution 1/(60+1)
    val docs = Seq(
      (1L, "spark spark spark spark"), // lexically dominant, no embedding
      (2L, "join join"),
      (3L, "spark filler words here"),
      (4L, "nothing relevant")
    ).toDF("doc_id", "text")
    val embs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0), // the query vector
      (3L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1)  // identical → cos 1
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hybridSearch(docs, embs,
      queryTerms = Seq("spark", "join"), queryVecId = 0L, k = 3, kEach = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), Option(r.getAs[Any]("lex_rank")),
        Option(r.getAs[Any]("sem_rank")), r.getAs[Long]("rrf_e9")))
    def contrib(r: Option[Any]): Long =
      r.map(v => math.round(1e9 / (60 + v.asInstanceOf[Long]))).getOrElse(0L)
    // fusion arithmetic is exactly the e9 contributions, row by row
    out.foreach { case (id, lex, sem, rrf) =>
      assert(rrf == contrib(lex) + contrib(sem), s"doc $id: $lex $sem $rrf")
    }
    // doc 3 (both lists) outranks doc 1 (single list, even at rank 1)
    assert(out.head._1 == 3L, s"both-lists doc must fuse on top: ${out.toSeq}")
    assert(out.head._3.contains(1L)) // semantic rank 1
    // descending fused order
    val rrfs = out.map(_._4).toSeq
    assert(rrfs == rrfs.sorted.reverse, rrfs)
  }

  test("hardNegatives: cross-label only, nearest wrong-label first, k guaranteed") {
    // query 1 (label 0) sits on the x axis; its OWN label also owns the
    // near-identical vec 2 — which must be excluded — while the nearest
    // wrong-label vector is the x-adjacent vec 6 (label 1)
    val labeled = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.0f), 0), // same label: never returned
      (6L, Array(0.9f, 0.1f, 0.0f, 0.0f), 1),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val q = labeled.filter($"vec_id" === 1)
    val out = Similarity.hardNegatives(labeled, q, k = 3).collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("neighbor_label")))
    assert(out.forall(_._3 != 0), s"own-label neighbor leaked: ${out.toSeq}")
    // k=3 wrong-label rows exist and all are returned, nearest first
    assert(out.toSeq == Seq((1L, 6L, 1), (2L, 3L, 1), (3L, 4L, 2)), out.toSeq)
  }

  test("clusterBalancedSample: seed-cell assignment, exact per-cell quota, spread-key order") {
    // k=2 → centroids are v1 ([1,0,0,0], cell 1) and v2 ([.9,.1,0,0], cell 2)
    // assignment by dot/‖c‖: v1→1 (1.0 vs .994), v2→2 (.9 vs .82/.906=.905?
    //  dot(v2,c1)=0.9, dot(v2,c2)=0.82/.90554=0.9055 → cell 2), v3→2
    // (0 vs .1/.90554=.1104), v4 ties at 0 → lowest cell 1, v5→1 like v1
    val out = Similarity.clusterBalancedSample(corpus, k = 2, perCluster = 10)
      .collect().map(r => (r.getAs[Long]("cell"), r.getAs[Long]("rnk"),
        r.getAs[Long]("vec_id")))
    val byCell = out.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(byCell(1L) == Set(1L, 4L, 5L))
    assert(byCell(2L) == Set(2L, 3L))
    // quota: perCluster=1 keeps exactly one per cell, chosen by the
    // multiplicative spread key, not the lowest vec_id
    def skey(id: Long) = (id * 2654435761L) % 2147483648L
    val one = Similarity.clusterBalancedSample(corpus, k = 2, perCluster = 1)
      .collect().map(r => (r.getAs[Long]("cell"), r.getAs[Long]("vec_id"))).toMap
    assert(one(1L) == Seq(1L, 4L, 5L).minBy(skey))
    assert(one(2L) == Seq(2L, 3L).minBy(skey))
  }

  test("LSH top-k always finds an identical vector (same signature)") {
    val q = corpus.filter($"vec_id" === 1)
    val out = Similarity.lshTopK(corpus, q, k = 3).collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("neighbor_id")))
    assert(out.nonEmpty)
    assert(out.head == ((1L, 5L))) // exact copy shares every band
  }

  test("IVF top-k: recall@10 curve vs brute force across nProbe (trained to convergence)") {
    val e = graft.ops.Similarity.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = pairs(Similarity.bruteForceTopK(e, q, k = 10))
    // ONE training run for the whole sweep: retraining per point would
    // let float-mean aggregation order perturb centroids between runs
    // and break the monotonicity the shared model guarantees
    val centroids = Similarity.trainCentroids(e, nCells = 10)
    val recalls = Seq(1, 2, 3, 5).map { nProbe =>
      val ivf = pairs(Similarity.ivfSearch(e, q, centroids, k = 10, nProbe = nProbe))
      nProbe -> (brute & ivf).size.toDouble / brute.size
    }
    info("IVF recall@10 vs nProbe (nCells=10, Lloyd to convergence): " +
      recalls.map { case (p, r) => f"nProbe=$p%d:$r%.3f" }.mkString("  "))
    // more probes can only add candidate cells — recall is monotone
    recalls.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
      assert(rb >= ra - 1e-9, s"recall regressed from nProbe=$pa ($ra) to nProbe=$pb ($rb)")
    }
    assert(recalls.last._2 >= 0.5,
      s"recall@10 at nProbe=5 too low: ${recalls.last._2}")
    assert(recalls.head._2 > 0.0, "nProbe=1 found nothing")
  }

  test("filtered ANN: brute respects the predicate; filtered IVF holds recall with more probes") {
    val e = graft.ops.Similarity.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val pred = $"label" === 3
    val allowed = e.filter(pred).select($"vec_id").as[Long].collect().toSet
    val brute = pairs(Similarity.bruteForceTopKFiltered(e, q, pred, k = 10))
    assert(brute.nonEmpty && brute.forall { case (_, n) => allowed.contains(n) },
      "every filtered neighbor must satisfy the predicate")
    // filtered IVF: same predicate, centroids trained on the full corpus;
    // a 1/10-selective filter thins every cell, so probe wider
    val ivf = pairs(Similarity.ivfTopKFiltered(e, q, pred, k = 10, nProbe = 5))
    assert(ivf.forall { case (_, n) => allowed.contains(n) })
    val recall = (brute & ivf).size.toDouble / brute.size
    info(f"filtered IVF recall@10 at nProbe=5: $recall%.3f")
    assert(recall >= 0.5, s"filtered recall too low: $recall")
    // the filter must reach the corpus scan, not hang above the join
    val plan = Similarity.bruteForceTopKFiltered(e, q, pred, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)")
      || plan.contains("EqualTo(label,3)"), plan)
  }

  test("IVF-PQ: continuum recall tracks plain IVF; widening the shortlist never hurts") {
    val e = graft.ops.Similarity.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = pairs(Similarity.bruteForceTopK(e, q, k = 10))
    def recallAt(shortlist: Int) = {
      val pq = pairs(Similarity.ivfPqTopK(e, q, k = 10, nProbe = 5,
        shortlist = shortlist))
      (brute & pq).size.toDouble / brute.size
    }
    val r50 = recallAt(50)
    val r200 = recallAt(200)
    info(f"IVF-PQ recall@10 (nProbe=5): shortlist=50:$r50%.3f  shortlist=200:$r200%.3f")
    // the exact re-rank can only improve as the ADC shortlist widens
    // (both searches share deterministic seeds, so the probed cells
    // agree); and the PQ scan must not collapse below the useful range
    assert(r200 >= r50 - 1e-9, "wider shortlist must not lose neighbors")
    assert(r50 >= 0.4, s"IVF-PQ recall@10 too low: $r50")
  }

  test("PQ codebooks: dense per-subspace codes, encode maps a centroid to itself") {
    val e = graft.ops.Similarity.embeddings(spark, "/root/testdata/sf0.001")
    val books = Similarity.trainPqCodebooks(e, m = 8, pqK = 16).collect()
    assert(books.length == 8 * 16)
    books.groupBy(_.getAs[Int]("subspace")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("code")).sorted.toSeq == (0L until 16L),
        "codes must be dense 0..pqK-1 per subspace")
      rows.foreach(r =>
        assert(r.getAs[collection.Seq[Float]]("centroid").length == 8))
    }
  }

  test("persisted IVF index: search parity with in-memory path, DPP prunes cells") {
    val e = graft.ops.Similarity.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter($"vec_id" < 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val centroids = Similarity.buildIvfIndex(e, dir, nCells = 10)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"))).toSeq
    // parity against the in-memory search with the SAME trained model
    // (retraining would let float-mean aggregation order perturb cells)
    val inMem = pairs(Similarity.ivfSearch(e, q, centroids, k = 10, nProbe = 3))
    val indexed = Similarity.ivfSearchIndexed(spark, dir, q, k = 10, nProbe = 3)
    assert(pairs(indexed) == inMem)
    // the scale claim: probing must prune to the probed cells'
    // DIRECTORIES, not scan the whole assignment table
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"cell-partitioned search did not plan dynamic partition pruning:\n$plan")
  }

  test("persisted IVF-PQ index: codes-only on disk, DPP prunes, recall matches in-memory class") {
    val e = graft.ops.Similarity.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter($"vec_id" < 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    Similarity.buildIvfPqIndex(e, dir)
    // the durable memory claim: the index stores (vec_id, codes) only —
    // no float vectors on disk
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.schema.fieldNames.sorted.toSeq == Seq("cell", "codes", "vec_id"))
    assert(!codes.schema.fields.exists(_.dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true)))
    codes.head(3).foreach { r =>
      val cs = r.getAs[collection.Seq[Long]]("codes")
      assert(cs.length == 8 && cs.forall(c => c >= 0 && c < 16))
    }
    val indexed = Similarity.ivfPqSearchIndexed(spark, dir, e, q,
      nProbe = 5, shortlist = 200)
    // DPP: probing reads only the probed cells' directories
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"cell-partitioned PQ search did not plan dynamic partition pruning:\n$plan")
    // recall sanity vs brute force (the exact parity claim lives with
    // the in-memory path's oracle; the index path retrains, so compare
    // recall class, not row identity)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = pairs(Similarity.bruteForceTopK(e, q, k = 10))
    val got = pairs(indexed)
    val recall = (brute & got).size.toDouble / brute.size
    info(f"persisted IVF-PQ recall@10 (nProbe=5, shortlist=200): $recall%.3f")
    assert(recall >= 0.5, s"indexed IVF-PQ recall too low: $recall")
  }

  test("sampled IVF training falls back to the full corpus on a degenerate id-sample") {
    // odd-only vec_ids: the default 1/4 id-sample (vec_id % 4 == 0) is
    // EMPTY — search must still work, not silently return nothing
    // (dim 64 per the embeddings-table contract the Lloyd mean assumes)
    val e = (1 to 40 by 2).map { i =>
      (i.toLong, Array.tabulate(64)(j => if (j == i % 4) 1.0f else 0.01f * i))
    }.toDF("vec_id", "embedding")
    val q = e.filter($"vec_id" === 1)
    val out = Similarity.ivfTopK(e, q, k = 5, nCells = 4, nProbe = 2)
    assert(out.count() == 5, "fallback training produced no search results")
  }

  test("quantizeEmbeddings: codes stay in 0..255 (exact 255 on this range), constant vector to zeros") {
    val e = Seq(
      // range [0,2]: codes floor(x*255/2) → 0, 127 (floor 127.5), 255
      (1L, Array(0.0f, 1.0f, 2.0f)),
      (2L, Array.fill(4)(3.5f)) // constant → all-zero codes
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeEmbeddings(e).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_dims"), r.getAs[Long]("code_sum"),
          r.getAs[Long]("code_min"), r.getAs[Long]("code_max"))).toMap
    assert(out(1L) == ((3L, 382L, 0L, 255L)))
    assert(out(2L) == ((4L, 0L, 0L, 0L)))
  }

  test("label centroid norms: unit cluster → norm 1") {
    val e = Seq(
      (1L, Array.fill(64)(0.0f).updated(0, 1.0f), 0),
      (2L, Array.fill(64)(0.0f).updated(0, 1.0f), 0),
      (3L, Array.fill(64)(0.0f).updated(1, 2.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidNorms(e).collect()
      .map(r => r.getAs[Long]("label") -> (r.getAs[Long]("n_vectors"), r.getAs[Double]("centroid_norm"))).toMap
    assert(out(0L) == ((2L, 1.0)))
    assert(out(1L) == ((1L, 2.0)))
  }

  test("incremental IVF-PQ: encode-only append lands twins that top the ADC shortlist") {
    val e = Similarity.embeddings(spark, "/root/testdata/sf0.001")
    val base = e.filter($"vec_id" >= 10).select($"vec_id", $"embedding")
    val queries = e.filter($"vec_id" < 5).select($"vec_id", $"embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_inc").toString
    Similarity.buildIvfPqIndex(base, dir, trainSampleMod = 1)
    // append exact twins of the queries at fresh ids: encoded with the
    // STORED codebooks a twin's codes equal the query's own encoding,
    // so its ADC distance is minimal and the search must surface it
    val twins = queries.select(($"vec_id" + 5000000L).as("vec_id"), $"embedding")
    Similarity.appendToIvfPqIndex(spark, dir, twins)
    assert(spark.read.parquet(s"$dir/codes").count() == base.count() + 5)
    val rowStore = base.unionByName(twins)
    val got = Similarity.ivfPqSearchIndexed(spark, dir, rowStore, queries,
      k = 1, nProbe = 3)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    (0L until 5L).foreach { qid =>
      assert(got(qid) == 5000000L + qid,
        s"appended twin of query $qid not found (got ${got(qid)})")
    }
  }

  test("incremental IVF: assign-only append keeps recall; appended twins are found") {
    val e = Similarity.embeddings(spark, "/root/testdata/sf0.001")
    val base = e.filter($"vec_id" < 350).select($"vec_id", $"embedding")
    val extra = e.filter($"vec_id" >= 350).select($"vec_id", $"embedding")
    val queries = e.filter($"vec_id" < 5).select($"vec_id", $"embedding")
    val incDir = java.nio.file.Files.createTempDirectory("ivf_inc").toString
    val scrDir = java.nio.file.Files.createTempDirectory("ivf_scr").toString
    Similarity.buildIvfIndex(base, incDir, nCells = 8, trainSampleMod = 1)
    Similarity.appendToIvfIndex(spark, incDir, extra)
    Similarity.buildIvfIndex(e.select($"vec_id", $"embedding"), scrDir,
      nCells = 8, trainSampleMod = 1)
    assert(spark.read.parquet(s"$incDir/cells").count() == e.count(),
      "append did not land every new vector in the index")

    def neighborSets(path: String): Map[Long, Set[Long]] =
      Similarity.ivfSearchIndexed(spark, path, queries, k = 10, nProbe = 3)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = Similarity.bruteForceTopK(e, queries, k = 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(m: Map[Long, Set[Long]]): Double =
      // keys.toSeq: mapping over the key SET would collapse equal
      // per-query recalls before the sum
      brute.keys.toSeq.map(q => (m.getOrElse(q, Set.empty) & brute(q)).size / 10.0)
        .sum / brute.size
    val rInc = recall(neighborSets(incDir))
    val rScr = recall(neighborSets(scrDir))
    // the incremental index searches base+appended with the BASE-trained
    // quantizer; its recall must stay within noise of a scratch rebuild
    // at the same nProbe (and both well above chance)
    assert(rInc >= rScr - 0.1, s"incremental recall $rInc vs scratch $rScr")
    assert(rInc > 0.5, s"incremental recall degenerate: $rInc")

    // deterministic completeness: append EXACT copies of the queries —
    // a twin assigns to its query's argmax cell, which is always the
    // query's top probe, so it MUST surface as the new top-1
    Similarity.appendToIvfIndex(spark, incDir,
      queries.select(($"vec_id" + 100000L).as("vec_id"), $"embedding"))
    val top1 = Similarity.ivfSearchIndexed(spark, incDir, queries, k = 1, nProbe = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toMap
    (0L until 5L).foreach(q =>
      assert(top1(q) == q + 100000L, s"appended twin of $q not found as top-1"))
  }

  test("ivfIndexStaleness: converged index near zero shift; drifted append raises it") {
    def unit(j: Int) = Array.tabulate(64)(i => if (i == j) 1.0f else 0.0f)
    // seeds (two lowest ids) start one per true cluster; identical
    // members make the Lloyd fixpoint the EXACT cluster mean, so a fresh
    // index must report shift == 0 on both cells
    val rows = (0L until 20L).map(i =>
      (i, if (i % 2 == 0) unit(0) else unit(1)))
    val dir = java.nio.file.Files.createTempDirectory("ivf_stale").toString
    Similarity.buildIvfIndex(rows.toDF("vec_id", "embedding"), dir,
      nCells = 2, maxIters = 10, trainSampleMod = 1)
    val fresh = Similarity.ivfIndexStaleness(spark, dir).collect()
      .map(r => r.getAs[Long]("cell") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Double]("mean_cos_dist"),
          r.getAs[Double]("centroid_shift"))).toMap
    assert(fresh.size == 2)
    fresh.values.foreach { case (n, cosd, shift) =>
      assert(n == 10L)
      assert(cosd < 1e-9, s"fresh index mean_cos_dist $cosd")
      assert(shift < 1e-9, s"fresh index centroid_shift $shift")
    }
    // drifted batch near cluster 0 (rotated toward a third axis): its
    // cell's member mean moves off the stored centroid, the other stays
    val drifted = (100L until 110L).map(i =>
      (i, Array.tabulate(64)(j => if (j == 0) 0.8f else if (j == 2) 0.6f else 0.0f)))
    Similarity.appendToIvfIndex(spark, dir, drifted.toDF("vec_id", "embedding"))
    val after = Similarity.ivfIndexStaleness(spark, dir).collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Double]("centroid_shift")).toMap
    assert(after.values.max > 0.01, s"drift not visible in shift: $after")
    assert(after.values.min < 1e-9, s"untouched cell drifted: $after")
  }

  test("semantic dedup: scaled twins cluster with their originals; cell-local = all-pairs") {
    val e = graft.ops.Similarity.embeddings(spark, "/root/testdata/sf0.001")
    // half-scaled twins: cosine-identical, byte-distinct — the duplicate
    // class exact-hash dedup misses (mirrors SparkEntry.semanticPlanted)
    val planted = e.select($"vec_id", $"embedding").unionByName(
      e.filter(pmod($"vec_id", lit(7L)) === 0L)
        .select(($"vec_id" + 2000000L).as("vec_id"),
          transform($"embedding", x => x * lit(0.5f)).as("embedding")))
    val out = Similarity.semanticDedup(planted, threshold = 0.9).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Boolean]("keeper"))).toMap
    val twinned = e.select($"vec_id").as[Long].collect().filter(_ % 7 == 0)
    assert(twinned.nonEmpty)
    twinned.foreach { v =>
      assert(out(v) == ((v, 2L, true)), s"original $v: ${out(v)}")
      assert(out(v + 2000000L) == ((v, 2L, false)), s"twin of $v: ${out(v + 2000000L)}")
    }
    // every non-twinned vector is its own singleton keeper (natural max
    // cosine 0.51 < 0.9), so cell-local pairing lost nothing vs all-pairs
    out.filterNot { case (v, _) => twinned.contains(v % 2000000L) }
      .foreach { case (v, lab) => assert(lab == ((v, 1L, true)), s"$v: $lab") }
    // recall vs the all-pairs exact baseline is EXACTLY 1 on this corpus
    val brute = graft.ops.Dedup.embeddingNearDup(planted, threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(brute == twinned.map(v => (v, v + 2000000L)).toSet)
  }

  test("embeddingDrift: per-dim cohort means from e6-quantized values, exact") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, -1.0f)), (2L, Seq(3.0f, 1.0f)), // cohort 0
      (1L, Seq(0.5f, 0.0f)) // cohort 1
    ).toDF("vec_id", "embedding")
    val out = Similarity.embeddingDrift(emb).collect()
      .map(r => (r.getAs[Long]("dim"), (r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("mean_a_e6"),
        r.getAs[Long]("mean_b_e6"), r.getAs[Long]("delta_e6")))).toMap
    assert(out(0L) == (2L, 1L, 2000000L, 500000L, 1500000L))
    assert(out(1L) == (2L, 1L, 0L, 0L, 0L))
  }

  test("matryoshkaAudit: hand-computable truncation error; zero-norm prefixes read as cos 0") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 1.0f)),
      (3L, Seq(0.0f, 0.0f)) // zero vector: guard path
    ).toDF("vec_id", "embedding")
    val out = Similarity.matryoshkaAudit(emb, dims = Seq(1, 2)).collect()
      .map(r => (r.getAs[Long]("d"), (r.getAs[Long]("n_pairs"),
        r.getAs[Long]("mean_err_e6"), r.getAs[Long]("max_err_e6"),
        r.getAs[Long]("n_distorted"), r.getAs[Long]("distorted_e4")))).toMap
    // pair (1,2): cos_full = 1/√2 ≈ 0.707107, cos at d=1 is exactly 1 →
    // err ≈ 0.292893 → 292893 e6-units; pair (2,3) is 0 under the guard
    assert(out(1L) == (2L, 146446L, 292893L, 1L, 5000L))
    assert(out(2L) == (2L, 0L, 0L, 0L, 0L))
  }

  test("kCenterSelect: picks one representative per orthogonal direction, ties on min id") {
    // three near-duplicates along axis 0, one point each on axes 1 and 2:
    // the greedy traversal must pick the seed (min id, axis 0), then the
    // two orthogonal points (distance e6 exactly 10^6), never a duplicate
    val emb = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.99f, 0.01f, 0f)),
      (3L, Array(0.98f, 0.02f, 0f)),
      (4L, Array(0f, 1f, 0f)), (5L, Array(0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.kCenterSelect(emb, k = 3).collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("min_dist_e6"))).toSeq
    assert(out == Seq((1L, 1L, -1L), (2L, 4L, 1000000L), (3L, 5L, 1000000L)))
  }

  test("kCenterSelect: k beyond the corpus size stops at the corpus") {
    val emb = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.kCenterSelect(emb, k = 10).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L))
  }
}
