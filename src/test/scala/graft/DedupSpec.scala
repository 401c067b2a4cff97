package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text about spark engines entirely"),
    (4L, "The  quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  test("shingles: 9 tokens → 7 distinct trigrams; short doc → empty") {
    val sh = docs.filter($"doc_id" === 1)
      .select(size(Dedup.shingles($"text")).as("n")).as[Int].head()
    assert(sh == 7)
    val short = Seq((9L, "just two")).toDF("doc_id", "text")
      .select(size(Dedup.shingles($"text")).as("n")).as[Int].head()
    assert(short == 0)
  }

  test("exact dedup groups case/whitespace-normalized duplicates") {
    val out = Dedup.exactDedup(docs).collect()
    assert(out.length == 3)
    val grp = out.find(_.getAs[Long]("keep_id") == 1L).get
    assert(grp.getAs[Long]("dup_count") == 2) // docs 1 and 4
  }

  test("n-gram Jaccard pairs: known overlap ratios") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // docs 1,2 share 6 of 8 distinct trigrams → 0.75; 1,4 identical → 1.0
    assert(pairs((1L, 2L)) == 0.75)
    assert(pairs((1L, 4L)) == 1.0)
    assert(pairs((2L, 4L)) == 0.75)
    assert(pairs.size == 3)
  }

  test("df cutoff drops boilerplate-driven pairs, keeps true near-dups") {
    // 10 docs share an identical boilerplate banner; two (20, 21) are also
    // true near-dups of each other in their unique content
    val boiler = "subscribe to our newsletter for updates and exclusive offers today"
    val corpus = (
      (0 until 10).map(i => (10L + i,
        s"$boiler unique content piece number $i with extra words alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i")) ++
      Seq(
        (20L, s"$boiler the shared near duplicate body of text that repeats almost verbatim in both documents here"),
        (21L, s"$boiler the shared near duplicate body of text that repeats almost verbatim in both documents too"))
    ).toDF("doc_id", "text")
    // without the guard, the boilerplate shingles alone push unrelated
    // docs over a low threshold
    val noGuard = Dedup.ngramJaccardPairs(corpus, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(noGuard.exists { case (a, b) => a < 20 && b < 20 }, noGuard.toString)
    // df ≤ 5 kills the banner (df=12) but keeps the unique-content
    // shingles (df ≤ 2): only the true near-dup pair survives
    val guarded = Dedup.ngramJaccardPairs(corpus, threshold = 0.2, maxDf = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == Set((20L, 21L)), guarded.toString)
  }

  test("MinHash+LSH finds the same pairs as exact Jaccard here") {
    val out = Dedup.minHashLsh(docs, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 4L)) == 1.0)
    // LSH is probabilistic but (16 bands × 4 rows) at j=0.75 has miss
    // probability ≈ 0.2% per pair; the verify step guarantees no false
    // positives regardless.
    assert(out.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(out.values.forall(_ >= 0.7))
  }

  test("SimHash: identical docs at hamming 0, near-dups within 7") {
    val out = Dedup.simHashPairs(docs, maxDist = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 4L)) == 0L)
    assert(out.keys.forall { case (a, b) => a < b })
  }

  test("near-dup clustering: transitive chains collapse to min-id components") {
    val allDocs = (1L to 7L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // 1-2-3 is a CHAIN (needs >1 propagation iteration), 5-6 a pair,
    // 4 and 7 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.nearDupClusters(allDocs, pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (1L, 3L) && out(2L) == (1L, 3L) && out(3L) == (1L, 3L))
    assert(out(5L) == (5L, 2L) && out(6L) == (5L, 2L))
    assert(out(4L) == (4L, 1L) && out(7L) == (7L, 1L))
  }

  test("cosine: orthogonal → 0, identical → 1") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(2.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cos = vecs.as("a").join(vecs.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id",
        round(Dedup.cosine($"a.embedding", $"b.embedding"), 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cos((1L, 2L)) == 0.0)
    assert(cos((1L, 3L)) == 1.0)
  }

  test("LSH-bucketed embedding near-dup: finds planted duplicates, no false positives") {
    val e = graft.ops.Similarity.embeddings(spark, "/root/testdata/sf0.001")
    // plant exact copies of the first 20 vectors under new ids — an
    // identical pair matches every band, so recall on plants is 1.0
    val plants = e.filter($"vec_id" < 20)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
    val corpus = e.select($"vec_id", $"embedding").union(plants)
    val lsh = Dedup.embeddingNearDupLsh(corpus, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 20L).foreach { i =>
      assert(lsh.contains((i, i + 100000)), s"planted pair $i missing")
    }
    // verification step bounds precision: everything returned really has
    // cos >= 0.99 (cross-check against the exact all-pairs baseline)
    val exact = Dedup.embeddingNearDup(corpus, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("embedding near-dup finds scaled copies, skips orthogonal") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(2.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(vecs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 3L)))
  }

  test("incrementalDedup: corpus dups, in-batch dups, and keepers all labeled") {
    val corpus = Seq((1L, "hello world"), (2L, "unique corpus doc"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "Hello   WORLD"),   // normalizes to a corpus text → dup_of_corpus
      (11L, "brand new doc"),   // corpus-new, first in batch → kept
      (12L, "brand  new doc"),  // same normalized text, later id → dup_in_batch
      (13L, "another fresh one") // singleton → kept
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(corpus, batch).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out == Map(
      10L -> (("dup_of_corpus", 1L)),
      11L -> (("kept", 11L)),
      12L -> (("dup_in_batch", 11L)),
      13L -> (("kept", 13L))))
  }

  test("bloomIncrementalDedup: identical labels, bloom prunes the corpus probe, empty index falls through") {
    val corpus = Seq((1L, "hello world"), (2L, "unique corpus doc"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "Hello   WORLD"),
      (11L, "brand new doc"),
      (12L, "brand  new doc"),
      (13L, "another fresh one")
    ).toDF("doc_id", "text")
    val idx = corpus
      .select(Dedup.contentFingerprint($"text").as("fp"), $"doc_id")
      .groupBy($"fp").agg(min($"doc_id").as("corpus_keeper"))
    val bloomed = Dedup.bloomIncrementalDedup(idx, batch, expectedItems = 64L)
    assert(bloomed.collect().map(_.toSeq).toSeq ==
      Dedup.incrementalDedupAgainstIndex(idx, batch).collect().map(_.toSeq).toSeq)
    // the pre-filter is in the plan: the corpus probe is gated by
    // might_contain over a literal bloom (analyzed plan — the optimizer
    // constant-folds the filter away on this LocalRelation fixture)
    assert(bloomed.queryExecution.analyzed.toString.contains("might_contain"),
      bloomed.queryExecution.analyzed.toString)
    // empty index → null bloom → plain path, everything corpus-new
    val emptyIdx = idx.filter(lit(false))
    val out = Dedup.bloomIncrementalDedup(emptyIdx, batch).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(10L -> "kept", 11L -> "kept",
      12L -> "dup_in_batch", 13L -> "kept"))
  }

  test("incrementalMinHashLsh equals the exact cross-pair set on a planted batch") {
    val docs = graft.ops.TextAnalysis.documents(spark, "/root/testdata/sf0.001")
    val batch = docs.filter(pmod(col("doc_id"), lit(5L)) === 0L)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" batchdup")).as("text"))
    val got = graft.ops.Dedup
      .incrementalMinHashLsh(docs, batch, threshold = 0.5, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // exact baseline: all-pairs Jaccard on the union, restricted to
    // corpus × batch (batch ids are offset, so doc_a < doc_b splits sides)
    val exact = graft.ops.Dedup
      .ngramJaccardPairs(
        docs.select(col("doc_id"), col("text")).unionByName(batch),
        threshold = 0.5)
      .filter(col("doc_a") < 1000000L && col("doc_b") >= 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == exact, s"lsh=${got.size} exact=${exact.size}")
    // every planted twin found its original
    val originals = docs.filter(pmod(col("doc_id"), lit(5L)) === 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val matched = got.collect { case (c, b, _) if b == c + 1000000L => c }
    assert(originals.subsetOf(matched.toSet),
      s"missing self-pairs: ${originals -- matched}")
  }

  test("operating-point guard: oracle corpus keeps a Jaccard gap around 0.5") {
    // q_minhash_lsh / q_cross_source_dups pair their value oracles on the
    // banding-recall argument: at the 0.5 / 32×2 operating point recall is
    // 1-ε only because no exact-Jaccard pair sits NEAR the threshold (the
    // measured corpus gap: nothing between ~0.15 and 0.8). If the test
    // corpus is ever regenerated with pairs inside that window, fail HERE,
    // loudly, instead of surfacing as an inscrutable oracle hash mismatch.
    val docs = graft.ops.TextAnalysis.documents(spark, "/root/testdata/sf0.01")
    val inWindow = Dedup.ngramJaccardPairs(docs, threshold = 0.2)
      .filter(col("jaccard") < 0.75)
    assert(inWindow.count() == 0,
      "corpus has exact-Jaccard pairs inside (0.2, 0.75) — the minHashLsh " +
        "recall-(1-ε) oracle argument no longer holds at threshold 0.5")
  }

  test("setSimJoinPrefix: identical rows to the all-pairs baseline (the exactness contract)") {
    // prefix filtering claims ZERO false negatives — so at every
    // threshold the output must equal ngramJaccardPairs row for row,
    // on the real corpus, including thresholds where t·sz lands on an
    // integer boundary (the double-ceil hazard the e4 arithmetic kills)
    val docs = graft.ops.TextAnalysis.documents(spark, "/root/testdata/sf0.001")
    for (t <- Seq(0.3, 0.5, 0.7, 0.9)) {
      val fast = Dedup.setSimJoinPrefix(docs, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val base = Dedup.ngramJaccardPairs(docs, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fast == base, s"prefix-filtered join diverged at t=$t")
      assert(t > 0.8 || fast.nonEmpty, s"degenerate corpus at t=$t")
    }
  }

  test("setSimJoinPrefix property: equals brute force on random corpora across thresholds") {
    import spark.implicits._
    // seeded-random corpora over a TINY vocabulary: heavy shingle
    // collisions, repeated within-doc tokens, set sizes 1..10 — the
    // regime where an off-by-one prefix (tie order, ceil boundary,
    // length filter) would actually show. Thresholds include exact
    // integer products (2/3 with sz=9, 0.75 with sz=8, 1.0).
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 12).map(i => s"w$i")
    for (trial <- 0 until 8) {
      val docs = (0 until 12).map { d =>
        val len = 3 + rnd.nextInt(10)
        (d.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val t = Seq(0.3, 0.5, 2.0 / 3, 0.75, 1.0)(trial % 5)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val fast = rows(Dedup.setSimJoinPrefix(docs, t))
      val base = rows(Dedup.ngramJaccardPairs(docs, t))
      assert(fast == base,
        s"trial $trial t=$t: fast-only=${fast.diff(base)} missed=${base.diff(fast)}")
    }
  }

  test("incrementalSetSimPrefix equals the LSH twin and finds every planted cross dup") {
    // at this corpus's operating point both incremental paths equal the
    // exact cross-pair set — LSH by the banding argument, prefix by
    // theorem — so their outputs must be row-identical
    val docs = graft.ops.TextAnalysis.documents(spark, "/root/testdata/sf0.001")
    val batch = docs.filter(pmod(col("doc_id"), lit(5L)) === 0L)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" batchdup")).as("text"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = rows(Dedup.incrementalSetSimPrefix(docs, batch, 0.5))
    val lsh = rows(Dedup.incrementalMinHashLsh(docs, batch, 0.5, bands = 32))
    assert(exact == lsh && exact.nonEmpty,
      s"exact=${exact.size} lsh=${lsh.size}")
    // every batch doc is a planted near-dup of its source: all present
    val ids = exact.map(_._2)
    val expected = docs.filter(pmod(col("doc_id"), lit(5L)) === 0L)
      .select(col("doc_id")).collect().map(_.getLong(0) + 1000000L).toSet
    assert(ids == expected, s"missing batch dups: ${expected.diff(ids)}")
  }

  test("incrementalSetSimPrefix: batch-novel shingles rank rarest and cannot drop pairs") {
    import spark.implicits._
    // batch doc = corpus doc plus a tail of tokens the corpus has never
    // seen: its prefix fills with df=0 novel shingles, and the pair must
    // STILL surface through the corpus-df-ordered index prefix
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "totally different content about other things entirely here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa brandnew1 brandnew2"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalSetSimPrefix(corpus, batch, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8 shared shingles, batch has 10, corpus 8 → J = 8/10 = 0.8 ≥ 0.6
    assert(out == Set((1L, 10L)), out.toString)
  }

  test("setSimJoinPrefix: boilerplate banner never drives candidates, true pair survives") {
    // ten docs share an identical high-df banner; only two are real
    // near-dups. The global rarity order puts the banner shingles at the
    // back of every sorted set, outside each prefix — the pair list must
    // contain exactly the true pair (plus banner-only docs pair up ONLY
    // if their full Jaccard clears the threshold, which it doesn't here)
    val boiler = "subscribe to our newsletter for updates and offers"
    val uniq = (1 to 10).map(i =>
      (i.toLong, s"$boiler document $i speaks about topic${i * 7} and " +
        s"subject${i * 13} entirely alone here"))
    val twin = Seq(
      (20L, "the quick brown fox jumps over the lazy dog tonight"),
      (21L, "the quick brown fox jumps over the lazy dog today"))
    val corpus = (uniq ++ twin).toDF("doc_id", "text")
    val out = Dedup.setSimJoinPrefix(corpus, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((20L, 21L)), out.toString)
  }

  test("repeatedSpans: maximal cross-doc spans, disjoint islands, within-doc repeats ignored") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "xx alpha beta gamma delta yy zz"),
      // the 3-gram "solo tokens repeat" recurs only WITHIN this doc
      (3L, "solo tokens repeat repeat tokens solo solo tokens repeat"),
      // shares d1's head gram and d1's tail gram — two disjoint islands
      (4L, "alpha beta gamma qq rr ss tt uu delta epsilon zeta ww")
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(corpus, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(out == Seq(
      (1L, 0L, 3L, 4L, 2L),  // "alpha beta gamma delta" vs d2/d4
      (1L, 3L, 5L, 3L, 1L),  // "delta epsilon zeta" vs d4
      (2L, 1L, 4L, 4L, 2L),
      (4L, 0L, 2L, 3L, 1L),
      (4L, 8L, 10L, 3L, 1L)
    ), s"got: $out")
    intercept[IllegalArgumentException](Dedup.repeatedSpans(corpus, k = 1))
    intercept[IllegalArgumentException](Dedup.repeatedSpans(corpus, minDocs = 1))
  }

  test("repeatedSpans/cutRepeatedSpans agree with a brute-force reference on seeded random corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee") // tiny → dense collisions
    val k = 3
    for (_ <- 1 to 5) {
      val docs = (1L to 12L).map(i =>
        (i, Seq.fill(3 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
      val grams = for {
        (id, ts) <- toks.toSeq; p <- 0 to ts.length - k
      } yield (id, p, ts.slice(p, p + k).mkString(" "))
      val byGram = grams.groupBy(_._3)
      val dup = byGram.filter(_._2.map(_._1).distinct.size >= 2).keySet
      // reference spans: gaps-and-islands over marked positions
      val expSpans = (for {
        (id, occ) <- grams.filter(g => dup(g._3)).groupBy(_._1).toSeq
        island <- occ.map(_._2).sorted
          .foldLeft(List.empty[List[Int]]) {
            case ((h @ (last :: _)) :: t, p) if p == last + 1 => (p :: h) :: t
            case (acc, p) => List(p) :: acc
          }.map(_.reverse).reverse
      } yield (id, island.head.toLong, (island.last + k - 1).toLong,
        (island.last - island.head + k).toLong, island.size.toLong)).sorted
      // reference cut: keep the global min (doc, pos) occurrence per gram
      val removed = dup.toSeq.flatMap { g =>
        byGram(g).map(x => (x._1, x._2)).sorted.tail
          .flatMap { case (id, p) => (p until p + k).map(id -> _) }
      }.toSet
      val expClean = docs.map { case (id, _) =>
        val ts = toks(id)
        (id,
          ts.zipWithIndex.collect { case (t, i) if !removed((id, i)) => t }
            .mkString(" "),
          ts.length.toLong,
          ts.indices.count(i => removed((id, i))).toLong)
      }.sortBy(_._1)
      val df = docs.toDF("doc_id", "text")
      val gotSpans = Dedup.repeatedSpans(df, k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sorted
      assert(gotSpans == expSpans, s"spans diverge:\n got $gotSpans\n exp $expSpans")
      val gotClean = Dedup.cutRepeatedSpans(df, k).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq.sortBy(_._1)
      assert(gotClean == expClean, s"cut diverges:\n got $gotClean\n exp $expClean")
    }
  }

  test("cutRepeatedSpans: keeps corpus-first occurrence, cuts the rest, rebuilds text") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "xx alpha beta gamma delta yy zz"),
      (3L, "solo tokens repeat repeat tokens solo solo tokens repeat"),
      (4L, "alpha beta gamma qq rr ss tt uu delta epsilon zeta ww")
    ).toDF("doc_id", "text")
    val out = Dedup.cutRepeatedSpans(corpus, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == Seq(
      // doc 1 holds every keeper occurrence — untouched
      (1L, "alpha beta gamma delta epsilon zeta", 6L, 0L),
      // overlapping windows p1/p2 union to token indices 1-4
      (2L, "xx yy zz", 7L, 4L),
      // within-doc-only repeats are not cross-doc dups — untouched
      (3L, "solo tokens repeat repeat tokens solo solo tokens repeat", 9L, 0L),
      // two disjoint cut windows, middle survives
      (4L, "qq rr ss tt uu ww", 12L, 6L)
    ), s"got: $out")
  }

  test("dedupThresholdSweep: pair and doc counts shrink monotonically past the knee") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), // identical → J = 1.0
      (3L, "a b c d x y"), // J = 2/6 ≈ 0.3333 against both
      (4L, "zz qq ww ee rr tt") // no shared shingles
    ).toDF("doc_id", "text")
    val out = Dedup.dedupThresholdSweep(docs, thresholdsE4 = Seq(3000L, 9000L))
      .collect()
      .map(r => (r.getAs[Long]("t_e4"),
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs_touched")))).toMap
    assert(out(3000L) == (3L, 3L)) // (1,2), (1,3), (2,3)
    assert(out(9000L) == (1L, 2L)) // only the identical pair
  }

  test("lshTuningSweep: an identical pair is caught with certainty in every banding") {
    // two identical docs (one Jaccard-1.0 pair), one unrelated doc that
    // shares no shingle — pow(1,r)=1 and pow(0,b)=0 are IEEE-exact, so
    // every config must report p = 1e6, zero expected misses, zero FPs
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val out = graft.ops.Dedup.lshTuningSweep(docs, totalHashes = 128).collect()
    assert(out.length == 8)
    assert(out.map(_.getAs[Long]("bands")).toSet ==
      Set(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L))
    out.foreach { r =>
      assert(r.getAs[Long]("n_pairs_total") == 1L, r)
      assert(r.getAs[Long]("exp_caught_e6") == 1000000L, r)
      assert(r.getAs[Long]("exp_missed_high_e6") == 0L, r)
      assert(r.getAs[Long]("exp_fp_e6") == 0L, r)
    }
  }

  test("bloomSizing: fpp at the exact key count matches the closed form") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma delta")
    ).toDF("doc_id", "text") // 2 distinct fingerprints
    val out = graft.ops.Dedup.bloomSizing(docs, Seq(65536L), Seq(1L, 2L))
      .collect()
      .map(r => (r.getAs[Long]("k_hashes"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("bpk_e2"), r.getAs[Long]("fpp_e9"))).toSeq
    def fpp(k: Long) = math.round(math.pow(
      1.0 - math.pow(1.0 - 1.0 / 65536.0, (k * 2L).toDouble),
      k.toDouble) * 1e9)
    assert(out == Seq((1L, 2L, 3276800L, fpp(1L)), (2L, 2L, 3276800L, fpp(2L))))
  }

  test("lshTuningSweep: more rows per band lowers catch probability of a mid-similarity pair") {
    // overlap engineered to land between the FP and near-dup cutoffs:
    // catch probability must be monotonically non-increasing in r
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h x y")
    ).toDF("doc_id", "text")
    val rows = graft.ops.Dedup.lshTuningSweep(docs, totalHashes = 128)
      .collect()
      .sortBy(_.getAs[Long]("rows_per_band"))
      .map(_.getAs[Long]("exp_caught_e6")).toSeq
    assert(rows == rows.sorted.reverse, rows)
    assert(rows.head > rows.last, rows)
  }

  test("sortedNeighborhood: adjacent-sorted twin found; far keys produce no pair") {
    import spark.implicits._
    // id 2's corrupted twin ("appe …", dist 1) sorts immediately before
    // the clean label; the zebra row is windows away from both
    val part = Seq(
      (2L, "apple", "Brand#1", "ECONOMY"),
      (3L, "zebra", "Brand#2", "STANDARD")
    ).toDF("p_partkey", "p_name", "p_brand", "p_type")
    val out = graft.ops.Dedup.sortedNeighborhood(part).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("dist"))).toSeq
    assert(out == Seq((2L, 1000002L, 1L)))
  }

  test("fuzzyJoin: pigeonhole blocking loses no pair an exhaustive levenshtein join finds") {
    // labels engineered around the boundary: exact twin (dist 1 after
    // the deterministic corruption), a dist-2 neighbor, a dist-3 near
    // miss that must NOT match, and unrelated rows
    val part = Seq(
      (2L, "small ring", "Brand#1", "ECONOMY"),
      (3L, "small ring", "Brand#1", "ECONOMZ"),   // dist 1 from 2's label
      (4L, "small rink", "Brand#1", "ECONOMY"),   // dist 1 from 2's label
      (5L, "small wing", "Brand#1", "ECONOMY"),   // dist 2 from 2's label
      (6L, "smell rings", "Brand#1", "ECONOMY"),  // dist 3 from 2's label
      (8L, "large bolt", "Brand#2", "STANDARD"),
      (9L, "large bolt", "Brand#2", "STANDARD"),  // duplicate label of 8
      (10L, "red widget", "Brand#3", "PROMO")
    ).map { case (k, n, b, t) => (k, n, b, t, 1, 1.0) }
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    val out = graft.ops.Dedup.fuzzyJoin(part, dmax = 2).collect()
      .map(r => (r.getAs[Long]("dirty_id"), r.getAs[Long]("clean_id"),
        r.getAs[Long]("dist"))).toSeq
    // exhaustive reference: the same corruption + unblocked levenshtein
    def label(n: String, b: String, t: String) = s"$n $b $t"
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rowsIn = Seq(
      (2L, "small ring", "Brand#1", "ECONOMY"),
      (3L, "small ring", "Brand#1", "ECONOMZ"),
      (4L, "small rink", "Brand#1", "ECONOMY"),
      (5L, "small wing", "Brand#1", "ECONOMY"),
      (6L, "smell rings", "Brand#1", "ECONOMY"),
      (8L, "large bolt", "Brand#2", "STANDARD"),
      (9L, "large bolt", "Brand#2", "STANDARD"),
      (10L, "red widget", "Brand#3", "PROMO"))
    val clean = rowsIn.map { case (k, n, b, t) => (k, label(n, b, t)) }
    val dirty = rowsIn.filter(_._1 % 2 == 0).map { case (k, n, b, t) =>
      val l = label(n, b, t); (k, l.take(3) + l.drop(4)) }
    val brute = (for {
      (did, dl) <- dirty
      (cid, cl) <- clean
      d = lev(dl, cl) if d <= 2
    } yield (did, cid, d.toLong)).sortBy(p => (p._1, p._2))
    assert(out == brute)
    // the corrupted twin of 2 must hit 2 itself and its dist-1/2
    // neighbors, never the dist-3 near miss
    val hitsOf2 = out.filter(_._1 == 2L).map(_._2).toSet
    assert(hitsOf2.contains(2L) && !hitsOf2.contains(6L))
  }

  test("containmentPairs is asymmetric: the quote scores 1.0, the host does not") {
    import spark.implicits._
    // doc 2 contains doc 1 verbatim plus a long tail: every one of doc
    // 1's shingles appears in doc 2 (containment 1→2 = 1.0) but doc 2
    // has many shingles doc 1 lacks (containment 2→1 well under 1)
    val quote = "alpha beta gamma delta epsilon"
    val host = quote + " zeta eta theta iota kappa lambda mu nu xi"
    val docs = Seq((1L, quote), (2L, host), (3L, "totally unrelated words here"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, thresholdE6 = 100000L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(out((1L, 2L)) == 1000000L)
    // 3 shared shingles of host's 12
    assert(out((2L, 1L)) == 250000L)
    assert(!out.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
