package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("docStats: token counts, distinct, type-token ratio") {
    val df = Seq((1L, "Hello World hello", "en", 17L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val r = TextAnalysis.docStats(df).head()
    assert(r.getAs[Long]("n_tokens") == 3)
    assert(r.getAs[Long]("n_distinct_tokens") == 2) // lowercased
    assert(r.getAs[Double]("type_token_ratio") == 0.6667)
  }

  test("bpeish token count splits letter/digit/symbol runs") {
    val df = Seq((1L, "abc123 def!")).toDF("doc_id", "text")
    val n = df.select(TextAnalysis.bpeishTokenCount($"text")).as[Long].head()
    assert(n == 4) // abc | 123 | def | !
  }

  test("langId: marker votes with deterministic ties and 'und' fallback") {
    val df = Seq(
      (1L, "the cat of the house"),
      (2L, "der hund und die katze ist hier"),
      (3L, "zzz qqq xxx")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("en", 3L))
    assert(out(2L) == ("de", 4L))
    assert(out(3L) == ("und", 0L))
  }

  test("quality score components are bounded and averaged") {
    val text = ("the quick fox " * 10).trim // 139 chars → len band
    val df = Seq((1L, text, "en", text.length.toLong))
      .toDF("doc_id", "text", "lang", "n_chars")
    val r = TextAnalysis.qualityScore(df).head()
    assert(r.getAs[Double]("len_score") == 1.0)
    assert(r.getAs[Double]("stopword_score") <= 1.0)
    val exp = ((r.getAs[Double]("len_score") + r.getAs[Double]("stopword_score")
      + r.getAs[Double]("diversity")) / 3.0)
    assert(math.abs(r.getAs[Double]("quality") - exp) < 0.001)
  }

  test("rolling fingerprint: known value, content-sensitive") {
    val df = Seq((1L, "abc"), (2L, "abd"), (3L, "abc"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.rollingFingerprints(df).collect().map(_.getLong(1))
    assert(fps(0) == 96354L) // ((0*31+97)*31+98)*31+99
    assert(fps(0) != fps(1))
    assert(fps(0) == fps(2))
  }

  test("fingerprint is case/whitespace-insensitive") {
    val df = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "hello worlds")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(df).collect().map(_.getString(1))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("redactPii: counts every occurrence and rewrites all categories") {
    val df = Seq(
      (1L, "mail a@b.com and c.d+x@e.org, call +1-555-0100, from 192.168.0.1"),
      (2L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_ips"), r.getAs[String]("redacted"))).toMap
    assert(out(1L)._1 == 2 && out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(1L)._4 ==
      "mail <EMAIL> and <EMAIL>, call <PHONE>, from <IP>")
    assert(out(2L) == ((0L, 0L, 0L, "no pii here at all")))
  }

  test("redactPii property: no pattern matches its own redaction output") {
    // seeded random text with PII planted at random positions/counts —
    // the invariant the oracle's md5 can't express: redaction is total
    // (re-scanning the redacted text finds nothing) and count-faithful
    val rnd = new scala.util.Random(42)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    def pii(): (String, Int, Int, Int) = rnd.nextInt(3) match {
      case 0 => (s"u${rnd.nextInt(99)}@host${rnd.nextInt(9)}.example.org", 1, 0, 0)
      case 1 => (f"+${rnd.nextInt(89) + 10}%d-${rnd.nextInt(899) + 100}%d-${rnd.nextInt(8999) + 1000}%d", 0, 1, 0)
      case 2 => (s"${rnd.nextInt(255)}.${rnd.nextInt(255)}.${rnd.nextInt(255)}.${rnd.nextInt(255)}", 0, 0, 1)
    }
    val rows = (1 to 200).map { i =>
      val parts = (0 until rnd.nextInt(6)).map(_ =>
        if (rnd.nextBoolean()) (words(rnd.nextInt(words.size)), 0, 0, 0) else pii())
      (i.toLong, parts.map(_._1).mkString(" "),
        parts.map(_._2).sum.toLong, parts.map(_._3).sum.toLong,
        parts.map(_._4).sum.toLong)
    }
    val out = TextAnalysis.redactPii(
        rows.map(r => (r._1, r._2)).toDF("doc_id", "text"))
      .withColumn("residual",
        TextAnalysis.piiPatterns.map { case (_, pat, _) =>
          size(regexp_extract_all($"redacted", lit(pat), lit(0)))
        }.reduce(_ + _))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_ips"), r.getAs[Int]("residual"))).toMap
    rows.foreach { case (id, text, e, p, ip) =>
      val (ge, gp, gip, residual) = out(id)
      assert(residual == 0, s"doc $id: redacted text still matches PII")
      assert((ge, gp, gip) == ((e, p, ip)),
        s"doc $id '$text': expected ($e,$p,$ip) got ($ge,$gp,$gip)")
    }
  }

  test("repetitionSignals: known duplicate words and 2-grams") {
    // tokens: a b a b c → 5 tokens, 3 distinct, top count 2 (a and b)
    // 2-grams: "a b","b a","a b","b c" → 4 total, 3 distinct
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df).head()
    assert(r.getAs[Long]("n_tokens") == 5)
    assert(r.getAs[Long]("n_distinct_tokens") == 3)
    assert(r.getAs[Long]("top_word_count") == 2)
    assert(r.getAs[Long]("dup_word_frac_e4") == 4000)  // 2/5
    assert(r.getAs[Long]("dup_2gram_frac_e4") == 2500) // 1/4
    assert(r.getAs[Long]("top_word_share_e4") == 4000) // 2/5
  }

  test("langConfusion: declared-vs-predicted cells, und bucket") {
    val df = Seq(
      (1L, "the cat and the dog", "en"),   // predicted en — agreement
      (2L, "der hund und die katze", "en"), // predicted de — mislabel cell
      (3L, "zzz qqq xxx", "fr")             // no markers — und bucket
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langConfusion(df).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("predicted_lang")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(out == Map(
      ("en", "en") -> 1L, ("en", "de") -> 1L, ("fr", "und") -> 1L))
  }

  test("unigramLogProb: hand-computed model probabilities") {
    // corpus: "a a b" + "a c" → counts a:3 b:1 c:1, total 5
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logprob"))).toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val (la, lb) = (math.log(3.0 / 5), math.log(1.0 / 5))
    assert(out(1L) == ((3L, r4((la + la + lb) / 3))))
    assert(out(2L) == ((2L, r4((la + lb) / 2))))
    // the common-word doc scores higher than the rare-word doc
    assert(out(1L)._2 > out(2L)._2)
  }

  test("bigramLogProb: hand-computed interpolated model, short docs absent") {
    // corpus: "a b a" + "a b" + "c" → bigrams (a,b):2 (b,a):1;
    // histories a:2 b:1; unigrams a:3 b:2 c:1, total 6.
    // "c" has one token → no bigram → absent from output.
    val df = Seq((1L, "a b a"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob"))).toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val lab = math.log(0.8 * (2.0 / 2.0) + 0.2 * (2.0 / 6.0)) // P(b|a)
    val lba = math.log(0.8 * (1.0 / 1.0) + 0.2 * (3.0 / 6.0)) // P(a|b)
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((2L, r4((lab + lba) / 2))))
    assert(out(2L) == ((1L, r4(lab))))
  }

  test("bpeMerges: hand-computed merges, deterministic tie-break, early exhaustion") {
    // corpus: "low low lower" ×1 doc + "lowest" ×1 doc
    //   words: low:2 lower:1 lowest:1
    //   step 1 pairs: (l,o):4 (o,w):4 (w,e):2 (e,r):1 (e,s):1 (s,t):1
    //     → tie 4/4 broken by w1 asc: (l,o) wins → "lo"
    //   step 2: (lo,w):4 (w,e):2 ... → (lo,w) → "low"
    //   step 3: (low,e):2 (e,r):1 (e,s):1 (s,t):1 → (low,e) → "lowe"
    val df = Seq((1L, "low low lower"), (2L, "lowest")).toDF("doc_id", "text")
    val out = graft.ops.Tokenizer.bpeMerges(df, steps = 3).collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("w1"),
        r.getAs[String]("w2"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count")))
    assert(out.toSeq == Seq(
      (1L, "l", "o", "lo", 4L),
      (2L, "lo", "w", "low", 4L),
      (3L, "low", "e", "lowe", 2L)))
    // exhaustion: a single 2-char word has exactly 1 possible merge;
    // asking for 5 steps must end the table early, not loop or fail
    // ("ab" → "ab" merged; the fused word has one symbol, no pairs left)
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val t = graft.ops.Tokenizer.bpeMerges(tiny, steps = 5).collect()
    assert(t.map(r => (r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
      .toSeq == Seq(("ab", 1L)))
  }

  test("dsirWeights: hand-computed smoothed log-ratios, target = min source") {
    // buckets=8: 'x'→120%8=0, 'y'→121%8=1, 'z'→122%8=2 (single-char words:
    // PolyHash is just the codepoint). target = source "a" (min).
    // q: b0:2 b1:2 b2:1 (qt=5); t: b0:2 b1:1 (tt=3)
    val df = Seq((1L, "x x y", "a"), (2L, "y z", "b"))
      .toDF("doc_id", "text", "source")
    def w(tc: Long, qc: Long) =
      math.log((tc + 1.0) * (5 + 8) / ((qc + 1.0) * (3 + 8)))
    def e4(x: Double) = math.rint(x * 1e4).toLong
    val out = TextAnalysis.dsirWeights(df, buckets = 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("dsir_e4")))
    assert(out.toSeq == Seq(
      (1L, 3L, e4(2 * w(2, 2)) + e4(w(1, 2))),
      (2L, 2L, e4(w(1, 2)) + e4(w(0, 1)))))
    // the target-source doc must out-weigh the off-target doc
    assert(out(0)._3 > out(1)._3)
  }

  test("bpeEncode/bpeFertility: hand-applied merges over the bpeMerges corpus") {
    // same corpus as the bpeMerges test; after 3 merges (lo, low, lowe):
    //   low:2    → [low]          lower:1 → [lowe, r]
    //   lowest:1 → [lowe, s, t]
    val df = Seq((1L, "low low lower", "a"), (2L, "lowest", "b"))
      .toDF("doc_id", "text", "source")
    val enc = graft.ops.Tokenizer.bpeEncode(df, steps = 3).collect()
      .map(r => (r.getAs[String]("subword"), r.getAs[Long]("token_count"),
        r.getAs[Long]("n_words")))
    assert(enc.toSeq == Seq(
      ("low", 2L, 1L), ("lowe", 2L, 2L), ("r", 1L, 1L),
      ("s", 1L, 1L), ("t", 1L, 1L)))
    // source a: low×2 (1 subword) + lower×1 (2) → 4/3; source b: lowest → 3/1
    val fert = graft.ops.Tokenizer.bpeFertility(df, steps = 3).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_subwords"), r.getAs[Double]("fertility")))
    assert(fert.toSeq == Seq(("a", 3L, 4L, 1.3333), ("b", 1L, 3L, 3.0)))
  }

  test("typoPairs: deletion-key recall for substitutions, distance-2 rejected, planting") {
    // doc 5 is planted (doc_id % 5 == 0): "table value" → "tabl valu".
    // hash/hxsh share deletion key "hsh" (substitution recall);
    // abcd/abdc share key "abd" but levenshtein = 2 → must be filtered.
    val df = Seq(
      (1L, "table value table"),
      (2L, "hash hxsh abcd"),
      (3L, "abdc"),
      (5L, "table value")).toDF("doc_id", "text")
    val out = graft.ops.Tokenizer.typoPairs(df).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c1"), r.getAs[Long]("c2")))
    assert(out.toSeq == Seq(
      ("hash", "hxsh", 1L, 1L),
      ("tabl", "table", 1L, 2L),
      ("valu", "value", 1L, 1L)))
  }

  test("logProbBuckets: floors of the hand-computed scores, token mass per bucket") {
    // same corpus as above: scores -0.877 ("a a b") and -1.0601
    // ("a c") -> deci-buckets floor(-8.77) = -9 and floor(-10.601) = -11
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.logProbBuckets(df).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(out == Map(-9L -> ((1L, 3L)), -11L -> ((1L, 2L))))
  }

  test("vocabOovRate: cutoff tie-break by term, exact OOV fractions") {
    // counts: b:3 a:2 c:2 d:1 → top-2 vocab must be {b, a} (count desc,
    // term asc breaks the a/c tie in favor of a)
    val df = Seq((1L, "b b a c"), (2L, "b a c d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabOovRate(df, vocabSize = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Long]("oov_rate_e4"))).toMap
    assert(out(1L) == ((4L, 1L, 2500L)), "doc 1: only c is OOV")
    assert(out(2L) == ((4L, 2L, 5000L)), "doc 2: c and d are OOV")
  }

  test("chunkDocuments: overlap, trailing short chunk, sub-chunk doc") {
    val words = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, words), (2L, "tiny doc")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(df, chunkSize = 6, stride = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk_text")))
    // doc 1: starts 1,5,9 → [w1..w6], [w5..w10], [w9 w10]
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0L, 6L, "w1 w2 w3 w4 w5 w6"),
      (1L, 1L, 6L, "w5 w6 w7 w8 w9 w10"),
      (1L, 2L, 2L, "w9 w10")))
    // overlap: chunk 0 and 1 share w5 w6 (chunkSize − stride = 2 tokens)
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 2L, "tiny doc")))
  }

  test("unicode invariants: U+3000 is not \\s, combining marks count, CJK substr") {
    // the invariants q_unicode_tokens' oracle pairing rests on, pinned
    // in-repo so an engine/JDK upgrade that shifts them fails HERE first
    val df = Seq(
      (1L, "你好世界\u3000机器学习 test"), // U+3000 inside, ASCII space before test inside, ASCII space before test
      (2L, "e\u0301toile caf\u00e9") // combining acute + precomposed e-acute
    ).toDF("doc_id", "text")
    val toks = df.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // Java regex \s is ASCII-only: the ideographic space does NOT split
    assert(toks(1L) == Seq("你好世界　机器学习", "test"))
    assert(toks(2L) == Seq("e\u0301toile", "caf\u00e9")) // combining mark survives lower()
    val stats = df.select(col("doc_id"),
        length(col("text")).as("n"),
        size(TextAnalysis.charTrigrams(col("text"))).as("ntri"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // length counts CODEPOINTS: 8 CJK + U+3000 + space + 4 = 14;
    // combining sequence = 2 codepoints: 7 + space + 4 = 12
    assert(stats(1L) == ((14, 12)))
    assert(stats(2L) == ((12, 10)))
    // substr walks codepoints, not bytes: first trigram is 3 CJK chars
    val tri0 = df.filter(col("doc_id") === 1L)
      .select(element_at(TextAnalysis.charTrigrams(col("text")), 1))
      .collect()(0).getString(0)
    assert(tri0 == "你好世")
  }

  test("bm25Search: term-bearing docs only, tf and coverage dominate, deterministic order") {
    val docs = Seq(
      (1L, "spark join window spark"),    // both terms, tf(spark)=2
      (2L, "spark alone text here"),      // one term once
      (3L, "nothing relevant at all"),    // no query term → absent
      (4L, "spark join")                  // both terms, shorter doc
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Search(docs, Seq("spark", "join"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._1).toSeq == Seq(4L, 1L, 2L),
      s"got: ${out.toSeq}") // 4 beats 1: same coverage, half the length
    assert(out.forall(_._2 > 0L))
    intercept[IllegalArgumentException](
      TextAnalysis.bm25Search(docs, Seq.empty))
  }

  test("blocklistStats: exact hit counts, e4 ratio, C4 any-hit drop") {
    val docs = Seq(
      (1L, "clean text only here", "web"),          // 0 hits → kept
      (2L, "slow query slow scan", "web"),          // 2 hits of 4 → dropped
      (3L, "dup", "wiki"),                          // 1 hit of 1 → dropped
      (4L, "slowly duplicated", "wiki")             // substrings ≠ tokens → kept
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.blocklistStats(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("hit_ratio_e4"), r.getAs[Boolean]("kept")))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, true),
      (2L, 2L, 5000L, false),
      (3L, 1L, 10000L, false),
      (4L, 0L, 0L, true))) // token-exact match: "slowly" is not "slow"
  }

  test("vocabCoverage: hand-computed curve, size overrunning the vocab saturates") {
    // counts: a=4, b=2, c=1 → total 7; curve (size → covered):
    //   1 → 4 (rank 1 only), 2 → 6, 5 → 7 with only 3 terms used
    val docs = Seq((1L, "a a b c"), (2L, "a a b")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(docs, sizes = Seq(1, 2, 5)).collect()
      .map(r => (r.getAs[Long]("vocab_size"), r.getAs[Long]("covered_tokens"),
        r.getAs[Long]("n_terms_used"), r.getAs[Long]("total_tokens"),
        r.getAs[Long]("coverage_e4")))
    assert(out.toSeq == Seq(
      (1L, 4L, 1L, 7L, 5714L),
      (2L, 6L, 2L, 7L, 8571L),
      (5L, 7L, 3L, 7L, 10000L)))
  }

  test("sourceSimilarity: hand-computed cosines over the top-N vocab, identical sources tie") {
    // corpus counts: x=5 (2+2+1), y=2, z=5 → top-2 vocab (count desc,
    // term asc) = {x, z}; corpus vector (x,z) = (5,5), ‖c‖² = 50.
    //   a = b = (2, 0): cos = 10 / (√4·√50)  = 0.70710678… → 0.707107
    //   c     = (1, 5): cos = 30 / (√26·√50) = 0.83205029… → 0.832050
    // identical sources must land on the SAME double (integer dots +
    // correctly-rounded sqrt — no summation-order drift to split them)
    val docs = Seq(
      (1L, "x x y", "a"), (2L, "x x y", "b"), (3L, "x z z z z z", "c")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceSimilarity(docs, vocabSize = 2).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Double]("cos_vs_corpus")))
      .toMap
    assert(out("a") == out("b"), s"identical sources must tie: $out")
    assert(out("a") == 0.707107, s"got ${out("a")}")
    assert(out("c") == 0.83205, s"got ${out("c")}")
  }

  test("classifierEval: perfect separation scores AUC 1, full ties score exactly ½") {
    // "mono": score strictly increases with token count (ln-length term;
    // 2-char distinct words keep chars/token monotone too) and the label
    // flips exactly at the top half → perfect ranking, midrank AUC 10000
    val words = Seq("aa", "bb", "cc", "dd", "ee", "ff")
    val mono = (1 to 6).map(i =>
      (i.toLong, words.take(i).mkString(" "), if (i >= 4) "en" else "xx", "mono"))
    // "tied": identical text → identical scores; mixed labels must land
    // on the canonical tied value 5000, NOT an order-dependent number
    val tied = (11 to 14).map(i =>
      (i.toLong, "same text here", if (i % 2 == 0) "en" else "xx", "tied"))
    // "onelabel": degenerate — AUC undefined, must be null not a crash
    val one = (21 to 22).map(i => (i.toLong, "only positives", "en", "onelabel"))
    val docs = (mono ++ tied ++ one).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.classifierEval(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          Option(r.getAs[java.lang.Long]("auc_e4")).map(_.toLong)))).toMap
    assert(out("mono") == ((6L, 3L, Some(10000L))), out.toString)
    assert(out("tied") == ((4L, 2L, Some(5000L))), out.toString)
    assert(out("onelabel") == ((2L, 2L, None)), out.toString)
  }

  test("calibrationCurve: identical docs collapse to one bin whose rate is the label mix") {
    // four byte-identical docs → identical scores → a single bin; the
    // observed positive rate is exactly the 2/4 label mix and the mean
    // predicted score is the common score itself
    val docs = Seq(
      (1L, "same words here", "en"), (2L, "same words here", "en"),
      (3L, "same words here", "xx"), (4L, "same words here", "xx")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.calibrationCurve(docs).collect()
    assert(out.length == 1, out.mkString(";"))
    val r = out.head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("frac_pos_e4") == 5000L)
    assert(r.getAs[Long]("bin") ==
      math.min(7L, r.getAs[Long]("mean_score_e4") / 1250L))
  }

  test("expectedCalibrationError: single-bin curve gives ECE = MCE = the one gap") {
    // the same four-identical-docs fixture: one bin, gap =
    // |5000 − mean_score|, bin-weighted mean of one bin IS that gap
    val docs = Seq(
      (1L, "same words here", "en"), (2L, "same words here", "en"),
      (3L, "same words here", "xx"), (4L, "same words here", "xx")
    ).toDF("doc_id", "text", "lang")
    val curve = TextAnalysis.calibrationCurve(docs).collect().head
    val gap = math.abs(curve.getAs[Long]("frac_pos_e4") -
      curve.getAs[Long]("mean_score_e4"))
    val out = TextAnalysis.expectedCalibrationError(docs).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_bins") == 1L)
    assert(out.head.getAs[Long]("n_total") == 4L)
    assert(out.head.getAs[Long]("ece_e4") == gap)
    assert(out.head.getAs[Long]("mce_e4") == gap)
  }

  test("prCurve: zero weights pin every score at 5000 — counts flip exactly at the threshold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb", "en", "s"), (2L, "cc dd", "en", "s"), (3L, "ee ff", "de", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.prCurve(docs,
        weights = Seq(0.0, 0.0, 0.0, 0.0, 0.0),
        thresholds = Seq(4000L, 5000L, 6000L)).collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"),
        Option(r.getAs[java.lang.Long]("precision_e4")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("recall_e4")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("f1_e4")).map(_.toLong))).toSeq
    assert(out == Seq(
      (4000L, 2L, 1L, 0L, Some(6666L), Some(10000L), Some(8000L)),
      (5000L, 2L, 1L, 0L, Some(6666L), Some(10000L), Some(8000L)),
      (6000L, 0L, 0L, 2L, None, Some(0L), Some(0L))))
  }

  test("ndcgEval: a ranking that matches the ideal order scores exactly 10000") {
    import spark.implicits._
    // BM25 orders doc1 > doc2 > doc3 (strictly more matching terms at
    // equal length), which IS the relevance order → nDCG = 1
    val docs = Seq(
      (1L, "spark join window x"), (2L, "spark join a b"),
      (3L, "spark c d e"), (4L, "f g h i")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.ndcgEval(docs).collect().head
    def disc(i: Int) = math.round(1e9 * math.log(2.0) / math.log(i + 1.0))
    val idcg = 3L * disc(1) + 2L * disc(2) + 1L * disc(3)
    assert(out.getAs[Long]("k") == 10L)
    assert(out.getAs[Long]("idcg_e9") == idcg)
    assert(out.getAs[Long]("dcg_e9") == idcg)
    assert(out.getAs[Long]("ndcg_e4") == 10000L)
  }

  test("retrievalEval: MRR and AP on a ranking where a short tf-1 doc outranks a relevant one") {
    import spark.implicits._
    // BM25 with dl-normalization ranks d3 (tf3) > d2 (tf1 but SHORT) >
    // d1 (tf2): relevance (tf ≥ 2) hits at positions 1 and 3
    val docs = Seq(
      (1L, "x x a"), (2L, "x"), (3L, "x x x c"), (4L, "y z w")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .retrievalEval(docs, Seq("x"), k = 3).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_rel") == 2L)
    assert(r.getAs[Long]("first_rel_rank") == 1L)
    assert(r.getAs[Long]("rr_e6") == 1000000L)
    assert(r.getAs[Long]("hits_at_k") == 2L)
    // AP = (1e6·1/1 + 1e6·2/3) / 2 = (1000000 + 666666) div 2
    assert(r.getAs[Long]("ap_e6") == 833333L)
  }

  test("kendallTau: partially inverted tf/df rankings on hand data") {
    import spark.implicits._
    // tf ranking: aa(4) bb(3) cc(2); df ranking: bb(3) cc(2) aa(1)
    // pairs: (aa,bb) disc, (aa,cc) disc, (bb,cc) conc → τ = −1/3
    val docs = Seq(
      (1L, "aa aa aa aa"), (2L, "bb cc"), (3L, "bb cc"), (4L, "bb")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.kendallTau(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_items") == 3L)
    assert(r.getAs[Long]("concordant") == 1L)
    assert(r.getAs[Long]("discordant") == 2L)
    assert(r.getAs[Long]("tau_e6") == -333333L)
  }

  test("readability: Flesch score from exact word/sentence/syllable counts") {
    import spark.implicits._
    // 6 words, 2 sentence runs, 6 vowel groups:
    // 206.835 − 1.015·3 − 84.6·1 = 119.19
    val docs = Seq((1L, "The cat sat. The dog ran!", "s1"))
      .toDF("doc_id", "text", "source")
    val out = graft.ops.TextAnalysis.readability(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") == 1L)
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_syllables") == 6L)
    assert(r.getAs[Long]("flesch_e2") == 11919L)
  }

  test("mmrDiversify: a near-duplicate of the top hit is demoted below a fresh doc") {
    import spark.implicits._
    // d2 is byte-identical to d1 (similarity 1.0): plain BM25 would rank
    // it second; MMR's redundancy penalty pushes the distinct d3 ahead
    val docs = Seq(
      (1L, "x x x a"), (2L, "x x x a"), (3L, "x x y z"), (4L, "m n")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.mmrDiversify(docs, Seq("x")).collect()
      .map(r => (r.getAs[Long]("pick_rank"), r.getAs[Long]("doc_id")))
      .toSeq
    assert(out.map(_._2) == Seq(1L, 3L, 2L), out.mkString(";"))
  }

  test("ngramNovelty: first batch is all-new; a re-tread batch scores 0") {
    import spark.implicits._
    // batch 0 (docs 0..49 range: here 1,2): two distinct trigrams
    // batch 1 (doc 51): repeats doc 1's text → nothing new
    // batch 2 (doc 101): one fresh trigram
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f"), (51L, "a b c"), (101L, "g h i")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.ngramNovelty(docs).collect()
      .map(r => (r.getAs[Long]("batch"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_distinct_terms"), r.getAs[Long]("n_new_terms"),
        r.getAs[Long]("novelty_e4"))).toSeq
    assert(out == Seq(
      (0L, 2L, 2L, 2L, 10000L),
      (1L, 1L, 1L, 0L, 0L),
      (2L, 1L, 1L, 1L, 10000L)))
  }

  test("nucleusVocab: the 90% mass cut lands between head and tail") {
    import spark.implicits._
    // counts 8/1/1: 'a' and 'b' reach 90% of the 10-token mass; 'c'
    // starts exactly AT the threshold and is excluded
    val docs = Seq((1L, "a a a a a a a a b c", "s1"))
      .toDF("doc_id", "text", "source")
    val out = graft.ops.TextAnalysis.nucleusVocab(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("vocab_size"),
        r.getAs[Long]("total_tokens"), r.getAs[Long]("nucleus_size"),
        r.getAs[Long]("nucleus_share_e4"))).toSeq
    assert(out == Seq(("s1", 3L, 10L, 2L, 6666L)))
  }

  test("cohenKappa: cells reconcile and kappa matches a recomputation; degenerate marginals null out") {
    import spark.implicits._
    val docs = (1 to 40).map { i =>
      val text = if (i % 3 == 0) "the of and to in a " * 8 + s"w$i"
      else s"x$i y$i z$i"
      (i.toLong, text, text.length.toLong)
    }.toDF("doc_id", "text", "n_chars")
    val r = graft.ops.TextAnalysis.cohenKappa(docs).collect().head
    val (n, kk, kd, dk, dd) = (r.getAs[Long]("n"), r.getAs[Long]("n_kk"),
      r.getAs[Long]("n_kd"), r.getAs[Long]("n_dk"), r.getAs[Long]("n_dd"))
    assert(n == 40L && kk + kd + dk + dd == n)
    assert(r.getAs[Long]("agree_e4") == (kk + dd) * 10000L / n)
    val pe = (kk + kd) * (kk + dk) + (dk + dd) * (kd + dd)
    if (n * n != pe) {
      val expected =
        math.floor((n * (kk + dd) - pe) * 10000.0 / (n * n - pe)).toLong
      assert(r.getAs[Long]("kappa_e4") == expected)
    }
    // identical docs → both filters constant → chance agreement is
    // total agreement → kappa undefined (null), agreement 10000
    val same = (1 to 5).map(i => (i.toLong, "the of and to in", 16L))
      .toDF("doc_id", "text", "n_chars")
    val d = graft.ops.TextAnalysis.cohenKappa(same).collect().head
    assert(d.getAs[Long]("agree_e4") == 10000L)
    assert(d.isNullAt(d.fieldIndex("kappa_e4")))
  }

  test("featureHashAudit: single-char vocab collides exactly by ASCII residue") {
    import spark.implicits._
    // vocab {a,b,c,d}: PolyHash of one char is its code point, so the
    // 2-bucket table folds to parity (2 collisions) and the 4-bucket
    // table separates all four residues (0 collisions)
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.featureHashAudit(docs, Seq(1, 2))
      .collect()
      .map(r => (r.getAs[Long]("bits"), r.getAs[Long]("n_buckets"),
        r.getAs[Long]("vocab_size"), r.getAs[Long]("occupied"),
        r.getAs[Long]("collision_share_e4"))).toSeq
    assert(out == Seq((1L, 2L, 4L, 2L, 5000L), (2L, 4L, 4L, 4L, 0L)))
  }

  test("mcnemar: discordant cells reconcile with cohenKappa's and the integer chi-square recomputes") {
    import spark.implicits._
    val docs = (1 to 40).map { i =>
      val text = if (i % 3 == 0) "the of and to in a " * 8 + s"w$i"
      else s"x$i y$i z$i"
      (i.toLong, text, text.length.toLong)
    }.toDF("doc_id", "text", "n_chars")
    val k = graft.ops.TextAnalysis.cohenKappa(docs).collect().head
    val m = graft.ops.TextAnalysis.mcnemar(docs).collect().head
    assert(m.getAs[Long]("n") == k.getAs[Long]("n"))
    assert(m.getAs[Long]("n_b") == k.getAs[Long]("n_kd"))
    assert(m.getAs[Long]("n_c") == k.getAs[Long]("n_dk"))
    val (b, c) = (m.getAs[Long]("n_b"), m.getAs[Long]("n_c"))
    if (b + c > 0)
      assert(m.getAs[Long]("chi2_e4") == (b - c) * (b - c) * 10000 / (b + c))
    else assert(m.isNullAt(m.fieldIndex("chi2_e4")))
  }

  test("negativeSamplingTable: count^0.75 flattens the draw; probabilities are exact integer shares") {
    import spark.implicits._
    // token a appears 16 times, b once: w(a) = 16^0.75 = 8 exactly,
    // w(b) = 1 -> p(a) = 8e6*1e9 // 9e6, p(b) = 1e6*1e9 // 9e6
    val docs = Seq(
      (1L, ("a " * 16).trim),
      (2L, "b")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.negativeSamplingTable(docs)
      .collect().map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt"),
        r.getAs[Long]("w_e6"), r.getAs[Long]("p_e9")))
    assert(out.toSeq == Seq(
      ("a", 16L, 8000000L, 888888888L),
      ("b", 1L, 1000000L, 111111111L)))
    // raw-count sampling would give a 16/17 = 94% share; ^0.75 flattens
    // it to 88.9% -- the whole point of the table
    assert(out.head._4 < 16L * 1000000000L / 17L)
  }

  test("krippendorffAlpha: hand-computed coincidence matrix on two units; perfect agreement hits 1e6") {
    import spark.implicits._
    // doc 1 -> every rater says 2: n_chars >= 400; 10 distinct tokens
    // (vocab 10*3 div 10 = 3 -> clamp 2); 2 stopwords (2*10 div 10 = 2)
    val t1 = "the a b c d e f g h i"
    // doc 2 -> raters say (len 0, vocab 0, stop 2): short, one repeated
    // stopword token (distinct 1 -> 1*3 div 7 = 0; stop 7*10 div 7 -> 2)
    val t2 = "the the the the the the the"
    val docs = Seq(
      (1L, t1, 500L),
      (2L, t2, 50L)
    ).toDF("doc_id", "text", "n_chars")
    val r = graft.ops.TextAnalysis.krippendorffAlpha(docs).collect().head
    // units: d1 {2:3}, d2 {0:2, 2:1}; o2 off-diagonal 2+2 = 4;
    // marginals n_0 = 2, n_2 = 4, n = 6, n^2 - sum nc^2 = 16;
    // alpha = 1 - 5*4/32 = 0.375
    assert(r.getAs[Long]("n_units") == 2L)
    assert(r.getAs[Long]("n_ratings") == 6L)
    assert(r.getAs[Long]("n_categories") == 2L)
    assert(r.getAs[Long]("d_o_x2") == 4L)
    assert(r.getAs[Long]("alpha_e6") == 375000L)

    // internal agreement on two DIFFERENT classes -> alpha exactly 1
    val agree = Seq(
      (1L, t1, 500L),
      (2L, "x x x x x x x", 50L)
    ).toDF("doc_id", "text", "n_chars")
    val a = graft.ops.TextAnalysis.krippendorffAlpha(agree).collect().head
    assert(a.getAs[Long]("d_o_x2") == 0L)
    assert(a.getAs[Long]("alpha_e6") == 1000000L)

    // all ratings one category -> expected disagreement 0 -> NULL alpha
    val degen = Seq(
      (1L, "x x x x x x x", 50L),
      (2L, "y y y y y y y", 60L)
    ).toDF("doc_id", "text", "n_chars")
    val d = graft.ops.TextAnalysis.krippendorffAlpha(degen).collect().head
    assert(d.isNullAt(d.fieldIndex("alpha_e6")))
  }

  test("phraseSearch: overlapping occurrences and repeated-token phrases count exactly") {
    import spark.implicits._
    // 'a a a a' holds the trigram 'a a a' TWICE (overlap at starts 0,1);
    // 'x y z' appears in two docs; filler trigrams stay unique so the
    // top-5 cut is deterministic
    val docs = Seq(
      (1L, "a a a a"),
      (2L, "x y z q x y z"),   // 'x y z' twice in one doc
      (3L, "x y z"),
      (4L, "p q r s t")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.phraseSearch(docs, nPhrases = 2)
      .collect()
      .map(r => (r.getAs[String]("phrase"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_occurrences"))).toSeq
    // occurrence counts: 'x y z' ×3 across docs 2,3; 'a a a' ×2 in doc 1
    // (all other trigrams occur once) → top-2 = those, ordered by phrase
    assert(out == Seq(("a a a", 1L, 2L), ("x y z", 2L, 3L)), out.mkString(";"))
  }

  test("naiveBayesLangId: separable vocabularies classify perfectly; shared tokens follow the heavier class") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hund katze hund", "de"),
      (2L, "katze hund haus", "de"),
      (3L, "dog cat dog", "en"),
      (4L, "cat dog house", "en"),
      // cross-vocabulary doc: resubstitution puts its three 'cat's into
      // the de counts (c_de=3 + smoothing vs c_en=2), and the de prior
      // (3/5) helps — so even the all-English-token doc scores de:
      // de = ln(3/5) + 3·ln(4/15) ≈ −4.48 > en = ln(2/5) + 3·ln(3/12) ≈ −5.08
      (5L, "cat cat cat", "de")
    ).toDF("doc_id", "text", "lang")
    val out = graft.ops.TextAnalysis.naiveBayesLangId(docs).collect()
      .map(r => (r.getAs[String]("true_lang"), r.getAs[String]("pred_lang"),
        r.getAs[Long]("n_docs"))).toSeq
    assert(out == Seq(("de", "de", 3L), ("en", "en", 2L)), out.mkString(";"))
  }

  test("kneserNeyScore: micro-nat totals match a scalar reference implementation") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b a b c"),
      (2L, "b a b"),
      (3L, "c a b"))
    val docs = corpus.toDF("doc_id", "text")
    // scalar KN reference with the identical expression shape
    val bigrams = corpus.map { case (id, t) =>
      id -> t.split("\\s+").toSeq.sliding(2).map(p => (p(0), p(1))).toSeq }
    val all = bigrams.flatMap(_._2)
    val cBi = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cCtx = all.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val tLeft = cBi.keys.toSeq.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val tRight = cBi.keys.toSeq.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val tAll = cBi.size.toLong
    def lpE6(bg: (String, String)): Long = {
      val v = math.log((cBi(bg) - 0.75) / cCtx(bg._1) +
        0.75 * tLeft(bg._1) / cCtx(bg._1) * (tRight(bg._2).toDouble / tAll))
      BigDecimal(v * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val expected = bigrams.map { case (id, bgs) =>
      (id, bgs.size.toLong, bgs.map(lpE6).sum) }
    val out = graft.ops.TextAnalysis.kneserNeyScore(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("sum_lp_e6"))).toSeq
    assert(out == expected, s"got ${out.mkString(";")} want ${expected.mkString(";")}")
  }
}
