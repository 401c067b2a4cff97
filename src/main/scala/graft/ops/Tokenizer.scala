package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer induction over the corpus — the step a training pipeline
  * runs once to fix its vocabulary before token counting, packing, and
  * LM scoring (which [[TextAnalysis]] and [[Corpus]] already provide
  * downstream).
  *
  * The only corpus-scale operation is the word-frequency aggregate;
  * everything after runs on the VOCABULARY-sized table, which is the
  * real-world shape of byte-pair-encoding training (a 100 TB corpus has
  * a few tens of millions of distinct words — executor-trivial), so the
  * merge loop costs per-step job overhead, not data volume.
  */
object Tokenizer {

  /** Symbol delimiter inside a word's working sequence: U+241F, chosen
    * so it cannot collide with corpus text (defensively filtered out on
    * both engines; a production byte-level BPE would sidestep the
    * sentinel entirely by working on bytes).
    */
  val Sep = "␟"

  /** Byte-pair-encoding merge induction (Sennrich et al. 2016, the
    * public BPE algorithm): start from character symbols per word,
    * repeatedly take the corpus-weighted most frequent adjacent symbol
    * pair (ties broken by (w1, w2) ascending — deterministic and
    * engine-independent under binary collation) and fuse it everywhere.
    * Greedy left-to-right non-overlapping application — the semantics of
    * `replace` on the delimited sequence in both Spark and the oracle
    * engine, so "aaa" under merge (a,a) becomes ["aa", "a"].
    *
    * Returns the merge table (step, w1, w2, merged, pair_count) — the
    * artifact a tokenizer ships. Exact integers and strings, so the
    * oracle pairing is float-free.
    *
    * Shape at 100 TB: one corpus-sized explode + hash aggregate builds
    * the word table; each of the `steps` iterations is a vocabulary-
    * sized row-local pair explode + hash aggregate, a 1-row
    * TakeOrdered, a broadcast of that single row, and a row-local
    * `replace` — materialized per step via eager localCheckpoint so the
    * corpus aggregate runs ONCE (without it each step references its
    * predecessor twice and the lineage re-executes the scan 2^steps
    * times). No driver-side data beyond the per-step winning pair.
    */
  def bpeMerges(docs: DataFrame, steps: Int = 8): DataFrame =
    mergeLoop(docs, steps)._1
      .getOrElse(docs.sparkSession.emptyDataFrame)
      .select(col("step"), col("w1"), col("w2"),
        concat(col("w1"), col("w2")).as("merged"), col("pair_count"))
      .orderBy(col("step"))

  /** The shared merge loop: returns (merge table option, final vocabulary
    * with each word's fully-merged symbol `seq`). [[bpeMerges]] ships the
    * first; [[bpeEncode]] and [[bpeFertility]] consume the second — the
    * induce→apply halves of a tokenizer build read one loop so they can
    * never drift.
    */
  private def mergeLoop(
      docs: DataFrame, steps: Int): (Option[DataFrame], DataFrame) = {
    require(steps > 0, "steps must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .filter(!col("word").contains(Sep) && col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .select(col("word"), col("c"),
        regexp_replace(col("word"), "(.)", Sep + "$1").as("seq"))
    var vocab = words.localCheckpoint(true)
    // the per-step winner is ONE row — collect it (the greedy-argmax
    // sync-point discipline) instead of checkpointing a 1-row frame:
    // that removes per step one materialization job, one isEmpty job
    // and the broadcast crossJoin that re-attached the winner (the
    // winning pair enters the replace as plain string LITERALS);
    // measured 47 → ~2 jobs/step fewer across the q_bpe_* family
    var merges = List.empty[(Long, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val best = vocab
        .select(col("c"),
          expr(s"filter(split(seq, '$Sep'), x -> x <> '')").as("s"))
        .select(col("c"), explode(expr(
          """case when size(s) < 2 then array()
            |     else transform(sequence(1, size(s) - 1),
            |            i -> struct(element_at(s, i) as w1,
            |                        element_at(s, i + 1) as w2)) end
            |""".stripMargin)).as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(sum(col("c")).as("pair_count"))
        .orderBy(desc("pair_count"), col("w1"), col("w2"))
        .limit(1)
        .collect()
      if (best.isEmpty) {
        // tiny corpora can run out of pairs before `steps`; the merge
        // table just ends early (a real corpus never hits this)
        exhausted = true
      } else {
        val row = best.head
        val (w1, w2) = (row.getString(0), row.getString(1))
        merges :+= ((step.toLong, w1, w2, row.getLong(2)))
        vocab = vocab
          .select(col("word"), col("c"),
            replace(col("seq"), lit(Sep + w1 + Sep + w2),
              lit(Sep + w1 + w2)).as("seq"))
          .localCheckpoint(true)
        step += 1
      }
    }
    val mergesDf =
      if (merges.isEmpty) None
      else Some(merges.toDF("step", "w1", "w2", "pair_count")
        .select(col("w1"), col("w2"), col("pair_count"), col("step")))
    (mergesDf, vocab)
  }

  /** Apply the induced merge table: the corpus subword histogram after
    * `steps` BPE merges — (subword, token_count, n_words), the vocabulary
    * a tokenizer build would ship plus its corpus token mass. Exact
    * integers, so the chained-CTE oracle pairs with no float boundary.
    *
    * Shape at 100 TB: identical to [[bpeMerges]] (the loop IS shared) —
    * one corpus aggregate, then vocabulary-sized per-step work; the final
    * histogram is a row-local explode + hash aggregate of the vocabulary.
    */
  def bpeEncode(docs: DataFrame, steps: Int = 8): DataFrame = {
    val (_, vocab) = mergeLoop(docs, steps)
    vocab
      .select(col("word"), col("c"),
        explode(expr(s"filter(split(seq, '$Sep'), x -> x <> '')")).as("subword"))
      .groupBy(col("subword"))
      .agg(sum(col("c")).as("token_count"),
        countDistinct(col("word")).as("n_words"))
      .orderBy(col("subword"))
  }

  /** Tokenizer fertility per source — subwords emitted per word after
    * `steps` merges, the standard "which corpus does this tokenizer fit"
    * data-card row (fertility near 1 = the merges captured the source's
    * vocabulary; high fertility = the source fragments).
    *
    * Shape at 100 TB: one corpus-scale (source, word) aggregate joined to
    * the vocabulary-sized per-word subword count — the join key is the
    * word, so the exchange carries the per-source vocabulary, not the
    * corpus.
    */
  def bpeFertility(docs: DataFrame, steps: Int = 8): DataFrame = {
    val (_, vocab) = mergeLoop(docs, steps)
    val nSub = vocab.select(col("word"),
      size(expr(s"filter(split(seq, '$Sep'), x -> x <> '')"))
        .cast("long").as("n_sub"))
    docs
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("word"))
      .filter(!col("word").contains(Sep) && col("word") =!= "")
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("cs"))
      .join(nSub, "word")
      .groupBy(col("source"))
      .agg(sum(col("cs")).as("n_words"),
        sum(col("cs") * col("n_sub")).as("n_subwords"))
      .select(col("source"), col("n_words"), col("n_subwords"),
        round(col("n_subwords").cast("double") / col("n_words"), 4)
          .as("fertility"))
      .orderBy(col("source"))
  }

  /** Typo-candidate pairs in the corpus vocabulary — the normalization
    * signal an OCR/web-scrape cleaning stage mines before deciding on
    * spelling corrections: every pair of distinct words at Levenshtein
    * distance exactly 1, with both corpus frequencies (the canonical
    * spelling is usually the frequent side).
    *
    * The synthetic corpus draws from a fixed ~30-word vocabulary with
    * no natural distance-1 pairs, so (like the planted boilerplate in
    * lineDedup) the query PLANTS typos deterministically: documents
    * with doc_id % 5 == 0 lose the final character of every token
    * longer than 3 chars — the same corruption an OCR pass introduces —
    * and the oracle plants identically.
    *
    * Candidate generation is the public SymSpell/FastSS deletion trick:
    * each word emits itself plus all single-character-deletion variants
    * as join keys; two words within edit distance 1 ALWAYS share a key
    * (delete the edited position from the longer/changed side), so the
    * blocked join has recall 1 and the output equals the all-pairs
    * truth — the exact `levenshtein` filter then removes the false
    * candidates the shared keys admit.
    *
    * Shape at 100 TB: the corpus appears only in the word-frequency
    * aggregate; keys are vocabulary × (word length + 1) rows, the
    * equi-join is hash-partitioned on the deletion key, and the
    * candidate distinct + filter are pair-set-sized. No all-pairs
    * product anywhere.
    */
  def typoPairs(docs: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w0"))
      .select(when(col("doc_id") % 5 === 0 && length(col("w0")) > 3,
          col("w0").substr(lit(1), length(col("w0")) - 1))
        .otherwise(col("w0")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
    val keys = words.select(col("word"), col("c"), explode(expr(
      """concat(array(word),
        |  transform(sequence(1, length(word)),
        |    i -> concat(substring(word, 1, i - 1), substring(word, i + 1))))
        |""".stripMargin)).as("key"))
    keys.as("a")
      .join(keys.as("b"),
        col("a.key") === col("b.key") && col("a.word") < col("b.word"))
      .groupBy(col("a.word").as("w1"), col("b.word").as("w2"))
      .agg(first(col("a.c")).as("c1"), first(col("b.c")).as("c2"))
      .filter(levenshtein(col("w1"), col("w2")) === 1)
      .orderBy(col("w1"), col("w2"))
  }

  /** The chained-CTE ANSI twin of [[bpeMerges]] for the DuckDB oracle:
    * each step re-derives pair counts from the previous vocabulary CTE,
    * picks the same deterministically-tie-broken argmax, and applies the
    * same left-to-right `replace`. Generated programmatically because
    * the step count is a parameter — SQL has no bounded-iteration
    * construct that both engines share.
    */
  def bpeOracleSql(steps: Int = 8): String = {
    val union = (1 to steps).map(t => s"SELECT * FROM b$t").mkString(" UNION ALL ")
    s"""${mergeCtes(steps)}
       |SELECT step, w1, w2, w1 || w2 AS merged, cnt AS pair_count
       |FROM ($union) ORDER BY step""".stripMargin
  }

  /** Shared chained-CTE prefix: tok, v0, then (y_t, b_t, v_t) per step.
    * v_t joins its winning pair with LEFT JOIN ON TRUE + coalesce to a
    * no-op replace, so a pair-exhausted step carries the vocabulary
    * forward unchanged — matching [[mergeLoop]]'s early-exhaustion
    * behavior — instead of cross-joining it away to an empty table.
    */
  private def mergeCtes(steps: Int): String = {
    val S = Sep
    val head =
      s"""WITH tok AS (
         |  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
         |  FROM documents),
         |v0 AS MATERIALIZED (
         |  SELECT word, count(*)::BIGINT AS c,
         |    regexp_replace(word, '(.)', '$S\\1', 'g') AS seq
         |  FROM tok WHERE word NOT LIKE '%$S%' AND word <> '' GROUP BY 1)""".stripMargin
    val stepCtes = (1 to steps).map { t =>
      s"""y$t AS MATERIALIZED (
         |  SELECT word, c, unnest(s) AS sym, generate_subscripts(s, 1) AS i
         |  FROM (SELECT word, c,
         |          list_filter(string_split(seq, '$S'), x -> x <> '') AS s
         |        FROM v${t - 1})),
         |b$t AS MATERIALIZED (
         |  SELECT ${t}::BIGINT AS step, w1, w2, cnt FROM (
         |    SELECT a.sym AS w1, b.sym AS w2, sum(a.c)::BIGINT AS cnt
         |    FROM y$t a JOIN y$t b ON a.word = b.word AND b.i = a.i + 1
         |    GROUP BY 1, 2)
         |  ORDER BY cnt DESC, w1, w2 LIMIT 1),
         |v$t AS MATERIALIZED (
         |  SELECT word, c,
         |    replace(seq, coalesce('$S' || b.w1 || '$S' || b.w2, '$S'),
         |            coalesce('$S' || b.w1 || b.w2, '$S')) AS seq
         |  FROM v${t - 1} LEFT JOIN b$t b ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$stepCtes"
  }

  /** Oracle twin of [[bpeEncode]]: histogram of the step-`steps`
    * vocabulary's symbols.
    */
  def bpeEncodeOracleSql(steps: Int = 8): String = {
    val S = Sep
    s"""${mergeCtes(steps)}
       |SELECT sym AS subword, sum(c)::BIGINT AS token_count,
       |       count(DISTINCT word)::BIGINT AS n_words
       |FROM (SELECT word, c,
       |        unnest(list_filter(string_split(seq, '$S'), x -> x <> '')) AS sym
       |      FROM v$steps)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Oracle twin of [[bpeFertility]]: per-source word counts joined to
    * the final vocabulary's per-word symbol count.
    */
  def bpeFertilityOracleSql(steps: Int = 8): String = {
    val S = Sep
    s"""${mergeCtes(steps)},
       |nsub AS (
       |  SELECT word,
       |    len(list_filter(string_split(seq, '$S'), x -> x <> ''))::BIGINT AS n_sub
       |  FROM v$steps),
       |srcw AS (
       |  SELECT source, word, count(*)::BIGINT AS cs
       |  FROM (SELECT source,
       |          unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
       |        FROM documents)
       |  WHERE word <> '' AND word NOT LIKE '%$S%' GROUP BY 1, 2)
       |SELECT source, sum(cs)::BIGINT AS n_words,
       |       sum(cs * n_sub)::BIGINT AS n_subwords,
       |       round(sum(cs * n_sub)::DOUBLE / sum(cs), 4) AS fertility
       |FROM srcw JOIN nsub USING (word)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
