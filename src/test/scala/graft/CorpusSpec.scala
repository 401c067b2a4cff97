package graft

import graft.ops.Corpus

class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("curation keeps one representative per duplicate, gates quality and length") {
    val good = ("the quality of this document and the text in it " * 3).trim // 143 chars, 30 toks
    val docs = Seq(
      (1L, good, "en", good.length.toLong),
      (2L, good.toUpperCase, "en", good.length.toLong), // case-dup of 1 → dropped
      (3L, "too short", "en", 9L), // fails length + token gates
      (4L, ("zq xv " * 40).trim, "en", 239L) // no stopwords → low quality
    ).toDF("doc_id", "text", "lang", "n_chars")
    val kept = Corpus.curate(docs).collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(1L))
  }

  test("near-dup keeper is chosen among gate survivors, not all members") {
    val good = ("the quality of this document and the text in it " * 3).trim
    // near-dup of `good` (same periodic shingle set) that FAILS the
    // token gate (150 tokens > maxTokens 120): it is the cluster's min
    // doc_id, but must not drag the surviving member down with it
    val big = ((good + " ") * 5).trim
    val docs = Seq(
      (1L, big, "en", big.length.toLong),
      (2L, good, "en", good.length.toLong)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val kept = Corpus.curateNearDup(docs).collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(2L), "gate-surviving cluster member must be kept")
  }

  test("funnel accounts for every document") {
    val docs = graft.ops.TextAnalysis.documents(spark, "/root/testdata/sf0.001")
    val funnel = Corpus.curationFunnel(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(funnel("input") == 500)
    assert(funnel("kept") + funnel("dropped") == funnel("input"))
    assert(funnel("kept") > 0)
  }

  test("sampleKPerGroup: exact k, deterministic across partitionings, WindowGroupLimit stays") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 40L).map(i =>
      (i, s"document number $i with its own words", if (i % 2 == 0) "web" else "books"))
      .toDF("doc_id", "text", "source")
    val a = Corpus.sampleKPerGroup(docs, "source", 3).collect().map(_.toSeq).toSeq
    val b = Corpus.sampleKPerGroup(docs.repartition(7), "source", 3)
      .collect().map(_.toSeq).toSeq
    assert(a == b, "sample must not depend on partitioning")
    assert(a.count(_(1) == "web") == 3 && a.count(_(1) == "books") == 3)
    // the rank-filter rewrite pre-limits each group map-side
    val p = Corpus.sampleKPerGroup(docs, "source", 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("splitLeakage: order-insensitive buckets, cross-split flagged") {
    val splits = Seq(
      (1L, "train"), (2L, "test"), (3L, "train"), (4L, "train")
    ).toDF("doc_id", "split")
    val pairs = Seq((1L, 2L), (3L, 4L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Corpus.splitLeakage(splits, pairs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(out == Seq(
      ("test", "train", 2L, true),  // (1,2) and (2,3) fold to one bucket
      ("train", "train", 1L, false)
    ), s"got: $out")
  }

  test("dataCard: volumes, dup load, integer shares — hand-computed") {
    val docs = Seq(
      (1L, "one two three", "en", "web"),
      (2L, "ONE  two THREE", "en", "web"),  // exact dup of 1 after normalize
      (3L, "four five", "en", "web"),
      (4L, "six seven eight nine", "es", "books")
    ).toDF("doc_id", "text", "lang", "source")
    val out = Corpus.dataCard(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toSeq
    assert(out == Seq(
      // (source, lang, n_docs, n_tokens, distinct, dup, avg_e2, share_e4)
      ("books", "es", 1L, 4L, 1L, 0L, 400L, 2500L),
      ("web", "en", 3L, 8L, 2L, 1L, 266L, 7500L)
    ), s"got: $out")
  }

  test("splitByContent: identical text → identical split, weights validated, all docs covered") {
    val text = "some shared training document body with enough words"
    val docs = Seq(
      (1L, text), (2L, text),            // byte-identical → same split
      (3L, "a different document entirely"),
      (4L, "yet another body of text here")
    ).toDF("doc_id", "text")
    val out = Corpus.splitByContent(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == out(2L), "identical text must share a split")
    assert(out.values.forall(Set("train", "validation", "test")))
    intercept[IllegalArgumentException](
      Corpus.splitByContent(docs, Seq("train" -> 9999L))) // doesn't sum to 1e4
    intercept[IllegalArgumentException](
      Corpus.splitByContent(docs, Seq("train" -> 10000L, "test" -> 0L)))
  }

  test("curriculumPhases: histogram quantiles, score classes stay whole, hand-computed phases") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L),
      (5L, 4L), (6L, 5L), (7L, 6L), (8L, 7L)
    ).toDF("doc_id", "s")
    val out = Corpus.curriculumPhases(docs, col("s"), nPhases = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // cum_before per score: 1→0, 2→2, 3→3, 4→4, 5→5, 6→6, 7→7 of 8 docs
    assert(out == Map(
      1L -> 0L, 2L -> 0L, // the whole score-1 class shares phase 0
      3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L,
      7L -> 3L, 8L -> 3L), s"got: $out")
    intercept[IllegalArgumentException](
      Corpus.curriculumPhases(docs, col("s"), nPhases = 1))
  }

  test("stratifiedSample: rate 0 drops all, rate 1e4 keeps all, deterministic") {
    import org.apache.spark.sql.functions._
    val docs = (1 to 50).map(i => (i.toLong, s"doc number $i text", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val kept = Corpus.stratifiedSample(docs, Map("en" -> 0L), defaultRateE4 = 10000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == (1 to 50 by 2).map(_.toLong).toSet,
      "rate 0 must drop every en doc, default 1e4 must keep every de doc")
    // content-addressed: a second evaluation makes identical decisions
    val kept2 = Corpus.stratifiedSample(docs, Map("en" -> 0L), defaultRateE4 = 10000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == kept)
    intercept[IllegalArgumentException] {
      Corpus.stratifiedSample(docs, Map("en" -> 20000L))
    }
  }

  test("sourceMixture: sqrt flattening up-weights the small source") {
    // tokens: big source 9, small source 1 → proportional shares 90/10,
    // sqrt weights 3/(3+1)=0.75 and 1/(3+1)=0.25
    val docs = Seq(
      (1L, "w w w w w w w w w", "big"),
      (2L, "w", "small")
    ).toDF("doc_id", "text", "source")
    val out = Corpus.sourceMixture(docs, tokenBudget = 1000L).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("share_e4"),
          r.getAs[Double]("weight"), r.getAs[Long]("target_tokens"))).toMap
    assert(out("big") == ((9L, 9000L, 0.75, 750L)))
    assert(out("small") == ((1L, 1000L, 0.25, 250L)),
      "temperature must lift the small source above its 10% share")
  }

  test("lineDedup: frequent lines drop, order survives, all-boilerplate docs stay") {
    val boiler = "subscribe now"
    val docs = Seq(
      (1L, s"unique alpha\n$boiler\nunique omega"),
      (2L, s"$boiler\nsecond doc line"),
      (3L, boiler), // every line boilerplate → empty but present
      (4L, "untouched standalone text")
    ).toDF("doc_id", "text")
    val out = Corpus.lineDedup(docs, minDf = 3L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_lines_kept"),
          r.getAs[String]("kept_text"))).toMap
    assert(out(1L) == ((3L, 2L, "unique alpha\nunique omega")),
      "kept lines must preserve original order")
    assert(out(2L) == ((2L, 1L, "second doc line")))
    assert(out(3L) == ((1L, 0L, "")),
      "doc whose every line is boilerplate must survive as an empty row")
    assert(out(4L) == ((1L, 1L, "untouched standalone text")))
    // below the df threshold nothing is deleted
    val none = Corpus.lineDedup(docs, minDf = 4L).collect()
    assert(none.forall(r => r.getAs[Long]("n_lines_kept") == r.getAs[Long]("n_lines")))
    intercept[IllegalArgumentException] { Corpus.lineDedup(docs, minDf = 1L) }
  }

  test("boilerplatePhrases: df counts, threshold, deterministic rank") {
    // "a b c" appears in 3 docs, "x y z" in 2, "p q r" in 1
    val docs = Seq(
      (1L, "a b c tail one"), (2L, "a b c tail two"), (3L, "a b c"),
      (4L, "x y z"), (5L, "x y z"), (6L, "p q r")
    ).toDF("doc_id", "text")
    val out = Corpus.boilerplatePhrases(docs, n = 3, minDf = 2L, k = 10)
      .collect().map(r => (r.getAs[Long]("rnk"), r.getAs[String]("shingle"),
        r.getAs[Long]("df")))
    assert(out.head == ((1L, "a b c", 3L)))
    assert(out.map(_._2).contains("x y z") && !out.map(_._2).contains("p q r"))
  }

  test("crossSourceDupReport: within- vs cross-source pair counts") {
    val docs = Seq(
      (1L, "srcA"), (2L, "srcA"), (3L, "srcB")
    ).toDF("doc_id", "source")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("doc_a", "doc_b")
    val r = Corpus.crossSourceDupReport(docs, pairs).head()
    assert(r.getAs[Long]("n_pairs") == 3)
    assert(r.getAs[Long]("n_same_source") == 1)
    assert(r.getAs[Long]("n_cross_source") == 2)
    // empty pair set still reports a zero row, not an empty frame
    val empty = Corpus.crossSourceDupReport(docs,
      pairs.filter($"doc_a" < 0)).head()
    assert(empty.getAs[Long]("n_pairs") == 0)
  }

  test("lineDedup invariants on a seeded random corpus") {
    val rnd = new scala.util.Random(42)
    val pool = Vector("alpha", "beta", "gamma", "delta", "epsilon")
    val docs = (1 to 60).map { i =>
      val n = 1 + rnd.nextInt(5)
      (i.toLong, Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString("\n"))
    }.toDF("doc_id", "text")
    val originals = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // minDf above the doc count → identity on every document
    val id = Corpus.lineDedup(docs, minDf = 1000L).collect()
    id.foreach { r =>
      assert(r.getAs[String]("kept_text") == originals(r.getAs[Long]("doc_id")))
    }
    assert(id.length == 60)
    // real threshold → per-doc survivors are exactly the original lines
    // minus the globally-frequent ones, in original order
    val freq = originals.values.flatMap(_.split("\n").distinct)
      .groupBy(identity).collect { case (l, os) if os.size >= 10 => l }.toSet
    Corpus.lineDedup(docs, minDf = 10L).collect().foreach { r =>
      val expect = originals(r.getAs[Long]("doc_id")).split("\n")
        .filterNot(freq).mkString("\n")
      assert(r.getAs[String]("kept_text") == expect,
        s"doc ${r.getLong(0)}: survivors diverge from reference filter")
    }
  }

  test("contaminationCheck: exact overlap fractions, threshold gates, clean docs absent") {
    import org.apache.spark.sql.functions._
    val bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, bench),                                  // the benchmark doc
      // contains bench tokens 1..8 as a span → shingles: 10 total
      // ("w1 w2 alpha..theta" = 10 tokens → 3 shingles; overlap = 1)
      (1L, "w1 w2 alpha beta gamma delta epsilon zeta eta theta"),
      // fully copied benchmark text +2 tokens: 12 tokens → 5 shingles,
      // 3 of them are benchmark shingles (bench itself has 3)
      (2L, s"$bench tail1 tail2"),
      (3L, "clean words only nothing shared with anything here at all")
    ).toDF("doc_id", "text")
    val out = Corpus.contaminationCheck(docs, col("doc_id") === 0, n = 8,
        minOverlapE4 = 0).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_overlap"),
          r.getAs[Long]("overlap_frac_e4"))).toMap
    assert(out(1L) == ((3L, 1L, 3333L)))
    assert(out(2L) == ((5L, 3L, 6000L)))
    assert(!out.contains(3L), "clean doc must not be reported")
    // threshold gate: at 50% only the full copy survives
    val gated = Corpus.contaminationCheck(docs, col("doc_id") === 0, n = 8,
        minOverlapE4 = 5000).collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(gated == Seq(2L))
  }

  test("packSequencesShuffled: deterministic per epoch, re-deals across epochs, tiles exactly") {
    import org.apache.spark.sql.functions.col
    val corpus = graft.ops.TextAnalysis.documents(spark, "/root/testdata/sf0.001")
    def spans(epoch: Long) =
      Corpus.packSequencesShuffled(corpus, budget = 512L, nShards = 8, epoch = epoch)
        .orderBy(col("shard"), col("bin_id")).collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin_id"),
          r.getAs[String]("doc_spans"))).toSeq
    // same epoch → byte-identical plan; different epoch → different deal
    val e1 = spans(1L)
    assert(e1 == spans(1L), "same-epoch shuffle must be deterministic")
    assert(e1 != spans(2L), "different epochs must re-deal the corpus")

    // every doc's full token mass appears exactly once regardless of order
    val bins = Corpus.packSequencesShuffled(corpus, budget = 512L,
      nShards = 8, epoch = 1L).collect()
    val totalPacked = bins.map(_.getAs[Long]("n_tokens")).sum
    val totalCorpus = corpus
      .select(org.apache.spark.sql.functions.size(
        graft.ops.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .agg(org.apache.spark.sql.functions.sum(col("n"))).head().getLong(0)
    assert(totalPacked == totalCorpus, "shuffled bins must tile the corpus exactly")
    bins.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      rows.sortBy(_.getAs[Long]("bin_id")).init.foreach(r =>
        assert(r.getAs[Long]("n_tokens") == 512L, "non-final bin must be full"))
    }
  }

  test("hashKeys variants are value-identical to the string-keyed paths") {
    import org.apache.spark.sql.functions._
    // lineDedup on the planted-boilerplate corpus shape q_line_dedup uses
    val corpus = graft.ops.TextAnalysis.documents(spark, "/root/testdata/sf0.001")
    val planted = corpus.select(col("doc_id"), concat(col("text"),
      lit("\nsubscribe to our newsletter"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        lit("\nall rights reserved by the publisher")).otherwise(lit("")),
      concat(lit("\nref "), col("doc_id").cast("string"))).as("text"))
    def ldRows(hashKeys: Boolean) =
      Corpus.lineDedup(planted, minDf = 50L, hashKeys = hashKeys)
        .orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(ldRows(hashKeys = true) == ldRows(hashKeys = false))

    // contaminationCheck on the hand-computed planted case
    val bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, bench),
      (1L, "w1 w2 alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$bench tail1 tail2"),
      (3L, "clean words only nothing shared with anything here at all")
    ).toDF("doc_id", "text")
    def ccRows(hashKeys: Boolean) =
      Corpus.contaminationCheck(docs, col("doc_id") === 0, n = 8,
          minOverlapE4 = 0, hashKeys = hashKeys).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(ccRows(hashKeys = true) == ccRows(hashKeys = false))
  }

  test("packTokenBudget: hand-computed bins, straddles, shard-local invariants") {
    // one shard (nShards=1), budget 5; token counts 3,4,2,6 ->
    // starts 0,3,7,9 -> bins 0,0,1,1; offsets 0,3,2,4 (doc 2 straddles
    // bins 0->1, doc 4 straddles 1->2 -- concat-and-cut semantics)
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f g"), (3L, "h i"), (4L, "j k l m n o")
    ).toDF("doc_id", "text")
    val out = Corpus.packTokenBudget(docs, budget = 5L, nShards = 1).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("start_offset"), r.getAs[Long]("bin_id"),
          r.getAs[Long]("bin_offset"))).toMap
    assert(out(1L) == ((0L, 0L, 0L)))
    assert(out(2L) == ((3L, 0L, 3L)))
    assert(out(3L) == ((7L, 1L, 2L)))
    assert(out(4L) == ((9L, 1L, 4L)))

    // sharded invariants on the real corpus: offsets contiguous within
    // each shard in doc_id order, bin_offset always under budget
    val corpus = graft.ops.TextAnalysis.documents(spark, "/root/testdata/sf0.001")
    val packed = Corpus.packTokenBudget(corpus, budget = 512L, nShards = 8).collect()
    assert(packed.forall(r => r.getAs[Long]("bin_offset") < 512L))
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val inOrder = rows.sortBy(_.getAs[Long]("doc_id"))
      inOrder.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("start_offset") + a.getAs[Long]("n_tokens") ==
            b.getAs[Long]("start_offset"), "shard token stream has a gap")
        case _ =>
      }
    }
  }
  test("packSequences: bins tile the shard stream, straddles split at the boundary") {
    // single shard, budget 5: stream = a b c d e | f g h
    // bin 0 holds docs 0 (3 toks) + the first 2 of doc 1 (straddle);
    // bin 1 holds doc 1's tail (2) + doc 2 (1)
    val docs = Seq(
      (0L, "a b c"), (1L, "d e f g"), (2L, "h")
    ).toDF("doc_id", "text")
    val out = Corpus.packSequences(docs, budget = 5L, nShards = 1).collect()
    assert(out.length == 2)
    val b0 = out(0); val b1 = out(1)
    assert(b0.getAs[Long]("bin_id") == 0L && b0.getAs[Long]("n_docs") == 2L)
    assert(b0.getAs[Long]("n_tokens") == 5L)
    assert(b0.getAs[collection.Seq[String]]("tokens").toList == List("a", "b", "c", "d", "e"))
    assert(b0.getAs[String]("doc_spans") == "0:0:3 1:3:2")
    assert(b1.getAs[Long]("bin_id") == 1L && b1.getAs[Long]("n_docs") == 2L)
    assert(b1.getAs[Long]("n_tokens") == 3L)
    assert(b1.getAs[collection.Seq[String]]("tokens").toList == List("f", "g", "h"))
    assert(b1.getAs[String]("doc_spans") == "1:0:2 2:2:1")

    // real corpus, 8 shards: reassembling each shard's bins in bin order
    // must reproduce the concatenated doc-order token stream exactly,
    // and every non-final bin must hold exactly `budget` tokens
    val corpus = graft.ops.TextAnalysis.documents(spark, "/root/testdata/sf0.001")
    val bins = Corpus.packSequences(corpus, budget = 512L, nShards = 8).collect()
    import org.apache.spark.sql.functions.col
    val docToks = corpus
      .select(col("doc_id"), graft.ops.TextAnalysis.tokens(col("text")).as("t"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[collection.Seq[String]]("t").toList).toMap
    bins.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rows) =>
      val inOrder = rows.sortBy(_.getAs[Long]("bin_id"))
      inOrder.init.foreach(r =>
        assert(r.getAs[Long]("n_tokens") == 512L, "non-final bin must be full"))
      val reassembled = inOrder.flatMap(_.getAs[collection.Seq[String]]("tokens")).toList
      val expected = docToks.keys.toSeq.sorted
        .filter(id => id % 8 == shard).flatMap(docToks)
      assert(reassembled == expected, s"shard $shard stream mismatch")
    }
  }

  test("applyMixtureBudget: straddling doc kept, zero-target source absent") {
    // sources: web has 16 tokens (2 docs x 8), tiny has 4 (1 doc);
    // sqrt weights 4 and 2 -> targets at budget 12: round(12*4/6)=8,
    // round(12*2/6)=4. web: doc 1 (8 tokens) fills the target exactly
    // (cum_before 0 < 8), doc 3 (cum_before 8) is cut. tiny: doc 2 kept.
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8", "web"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8", "web"),
      (2L, "t1 t2 t3 t4", "tiny")
    ).toDF("doc_id", "text", "source")
    val out = Corpus.applyMixtureBudget(docs, tokenBudget = 12L).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("target_tokens"), r.getAs[Long]("n_docs_kept"),
          r.getAs[Long]("n_tokens_kept"), r.getAs[Long]("fill_e4"))).toMap
    assert(out("web") == ((8L, 1L, 8L, 10000L)))
    assert(out("tiny") == ((4L, 1L, 4L, 10000L)))

    // straddle semantics: shrink the budget so web's target (3 tokens)
    // is smaller than its first doc - the straddling doc must be KEPT
    val small = Corpus.applyMixtureBudget(docs, tokenBudget = 5L).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs_kept"), r.getAs[Long]("n_tokens_kept"))).toMap
    assert(small("web")._1 == 1L, "straddling doc must be kept")
    assert(small("web")._2 == 8L)
  }

  test("applyMixtureEpochs: full epochs + straddled partial, exact copy counts") {
    // web: 16 tokens (2 docs x 8), tiny: 4 tokens (1 doc); sqrt weights
    // 4/6 and 2/6. budget 36 -> targets round(24)=24 and round(12)=12.
    // web: 24 div 16 = 1 full epoch, rem 8 -> doc 1 (cum_before 0 < 8)
    // gets the extra copy, doc 3 (cum_before 8) does not.
    // tiny: 12 div 4 = 3 full epochs, rem 0 -> no partial copies.
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8", "web"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8", "web"),
      (2L, "t1 t2 t3 t4", "tiny")
    ).toDF("doc_id", "text", "source")
    val out = Corpus.applyMixtureEpochs(docs, tokenBudget = 36L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_copies"))).toMap
    assert(out(1L) == (("web", 8L, 2L)))
    assert(out(3L) == (("web", 8L, 1L)))
    assert(out(2L) == (("tiny", 4L, 3L)))
    // drawn token mass lands within one straddling doc of each target
    assert(out.values.filter(_._1 == "web").map(v => v._2 * v._3).sum == 24L)
    assert(out.values.filter(_._1 == "tiny").map(v => v._2 * v._3).sum == 12L)

    // a source whose target rounds below its size still behaves like the
    // budget draw: zero full epochs, partial epoch only (and a doc with
    // n_copies 0 is absent)
    val small = Corpus.applyMixtureEpochs(docs, tokenBudget = 9L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
    assert(small.get(3L).isEmpty, "past-target doc must not appear")

    // sharded decomposition exact at every width, same as the budget draw
    val expect = Corpus.applyMixtureEpochs(docs, tokenBudget = 36L,
      shardWidth = Long.MaxValue).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    for (w <- Seq(1L, 2L, 3L)) {
      val got = Corpus.applyMixtureEpochs(docs, tokenBudget = 36L, shardWidth = w)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == expect, s"shardWidth=$w diverged")
    }
  }

  test("applyMixtureBudget: sharded prefix sum is exact at every shard width") {
    // the hierarchical decomposition must be bit-identical to the
    // sequential per-source running sum regardless of how doc_ids land
    // in shards: width 1 (every doc its own shard — cum comes ENTIRELY
    // from the carry table), width 2 (straddles shard boundaries), and
    // the huge default (single shard — carry table all zeros)
    val docs = Seq(
      (0L, "a b c", "web"), (1L, "d e", "web"), (2L, "f g h i", "web"),
      (3L, "j", "web"), (4L, "k l m", "wiki"), (5L, "n o p q r", "wiki"),
      (6L, "s t", "wiki")
    ).toDF("doc_id", "text", "source")
    val expect = Corpus.applyMixtureBudget(docs, tokenBudget = 10L,
      shardWidth = Long.MaxValue).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("target_tokens"),
        r.getAs[Long]("n_docs_kept"), r.getAs[Long]("n_tokens_kept"),
        r.getAs[Long]("fill_e4"))).toSeq.sorted
    for (w <- Seq(1L, 2L, 3L)) {
      val got = Corpus.applyMixtureBudget(docs, tokenBudget = 10L, shardWidth = w)
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("target_tokens"),
          r.getAs[Long]("n_docs_kept"), r.getAs[Long]("n_tokens_kept"),
          r.getAs[Long]("fill_e4"))).toSeq.sorted
      assert(got == expect, s"shardWidth=$w diverged from sequential semantics")
    }
  }

  test("systematicSample: draws exactly k copies, proportional, shard-width-invariant") {
    // 7 docs, 20 tokens total; k = 5 positions over the token mass
    val docs = Seq(
      (0L, "a b c", "web"), (1L, "d e", "web"), (2L, "f g h i", "web"),
      (3L, "j", "web"), (4L, "k l m", "wiki"), (5L, "n o p q r", "wiki"),
      (6L, "s t", "wiki")
    ).toDF("doc_id", "text", "source")
    def draw(w: Long) = Corpus.systematicSample(docs, k = 5L, shardWidth = w)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_copies"))).toSeq
    val expect = draw(Long.MaxValue) // single shard = the sequential window
    // floors telescope: the draw is EXACTLY k copies, always
    assert(expect.map(_._3).sum == 5L, expect)
    // proportionality: every doc with ≥ W/k = 4 tokens must be drawn
    assert(expect.exists(_._1 == 2L), s"4-token doc 2 missed: $expect")
    assert(expect.exists(_._1 == 5L), s"5-token doc 5 missed: $expect")
    // a doc can never receive more copies than ⌊n·k/W⌋ + 1 positions
    expect.foreach { case (id, n, c) =>
      assert(c <= n * 5L / 20L + 1L, s"doc $id over-drawn: $c copies for $n tokens")
    }
    // the hierarchical decomposition is bit-identical at every width:
    // width 1 (cum entirely from the carry table), 2/3 (straddling)
    for (w <- Seq(1L, 2L, 3L))
      assert(draw(w) == expect, s"shardWidth=$w diverged from sequential semantics")
  }

  test("systematicSample: exact-k invariant holds on real data across k") {
    val docs = graft.ops.TextAnalysis.documents(spark, "/root/testdata/sf0.001")
    for (k <- Seq(1L, 7L, 200L, 5000L)) {
      val total = Corpus.systematicSample(docs, k = k, shardWidth = 64L)
        .agg(org.apache.spark.sql.functions.sum("n_copies")).head().getLong(0)
      assert(total == k, s"k=$k drew $total copies")
    }
  }

  test("domainCap keeps exactly k best-quality docs per source, map-side limited") {
    val docs = graft.ops.TextAnalysis.documents(spark, "/root/testdata/sf0.01")
    val out = Corpus.domainCap(docs, maxPerSource = 10).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    assert(bySource.size == 20 && bySource.values.forall(_.length == 10))
    // within a source: rk is 1..10 and quality non-increasing
    bySource.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to 10L))
      val qs = sorted.map(_.getAs[Double]("quality")).toSeq
      assert(qs.zip(qs.tail).forall { case (a, b) => a >= b }, qs)
    }
    // scale pin: the rank filter must stay in the WindowGroupLimit
    // rewrite (partial before the exchange + final after) so a hot
    // source ships k rows per upstream partition, not its full count
    val p = Corpus.domainCap(docs, maxPerSource = 10)
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(p).length == 2, p)
  }

  test("sampleAllocation: largest-remainder sums exactly to budget; weights ∝ N·range") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A", 10L), (2L, "A", 20L), // m = 2·10 = 20
      (3L, "B", 30L),                 // zero range → m = 0
      (4L, "C", 0L), (5L, "C", 5L), (6L, "C", 25L) // m = 3·25 = 75
    ).toDF("doc_id", "source", "n_chars")
    val out = Corpus.sampleAllocation(docs, budget = 10L).collect()
      .map(r => (r.getAs[String]("source"), (r.getAs[Long]("n_docs"),
        r.getAs[Long]("range_chars"), r.getAs[Long]("weight_e4"),
        r.getAs[Long]("alloc")))).toMap
    // den = 95: A floors to 2 (rem 10), C floors to 7 (rem 85), B gets 0;
    // the single leftover unit goes to the largest remainder (C)
    assert(out("A") == (2L, 10L, 2105L, 2L))
    assert(out("B") == (1L, 0L, 0L, 0L))
    assert(out("C") == (3L, 25L, 7894L, 8L))
    assert(out.values.map(_._4).sum == 10L)
  }

  test("weightedSample: exact-k, dense ranks, integer priority = hash*1e6 div tokens") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, size, split, lower}
    val docs = (1L to 40L)
      .map(i => (i, ("tok " * (i.toInt % 7 + 1)).trim + s" doc$i"))
      .toDF("doc_id", "text")
    val out = Corpus.weightedSample(docs, k = 10).collect()
    assert(out.length == 10)
    assert(out.map(_.getAs[Long]("rnk")).toSeq == (1L to 10L))
    // priorities non-decreasing in rank order; doc_ids distinct
    val pr = out.map(_.getAs[Long]("priority")).toSeq
    assert(pr.zip(pr.tail).forall { case (a, b) => a <= b })
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == 10)
    // the priority column is exactly hash·10⁶ div token-count (recomputed
    // independently), so the oracle's arithmetic twin can't drift
    val expect = docs.select(col("doc_id"),
        graft.ops.TextAnalysis.rollingFingerprint(col("text")).as("h"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("h") * 1000000L / r.getAs[Long]("n"))).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("priority") == expect(r.getAs[Long]("doc_id")))
    }
    // k ≥ corpus → every doc sampled (the bottom-k is a total order)
    assert(Corpus.weightedSample(docs, k = 100).count() == 40L)
  }
}
