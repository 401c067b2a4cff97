package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Closed-form model-fitting operators: grouped regression, one-pass
  * correlation matrices, mutual-information feature ranking, and
  * isotonic (monotone) calibration. The reference's analytics plane
  * stops at counts and means (`web-application.py` dashboards); these
  * are the next questions its users ask of the same tables — "what
  * drives this metric, per segment?", "which features are redundant?",
  * "is this score calibrated?" — each answered in one or two
  * aggregation passes whose state is a fixed handful of sufficient
  * statistics, never a second scan per group or per feature.
  *
  * Exactness discipline (the [[Analytics.olsMulti]] pattern): inputs
  * quantize to integers at the source, second-order sums accumulate in
  * DECIMAL(38,0) (BIGINT would wrap at 100 TB; DuckDB silently promotes
  * to HUGEINT, Spark must opt in), and the single double excursion at
  * the end goes through CHARACTER-IDENTICAL formula literals on both
  * engines, rounded at e6.
  */
object Modeling {

  /** Shared Spark-SQL/DuckDB centered-moment literal:
    * n·s_pq − s_p·s_q as a double from exact integer sums.
    */
  private def cm(spq: String, sp: String, sq: String): String =
    s"(CAST(n AS DOUBLE) * CAST($spq AS DOUBLE) - " +
      s"CAST($sp AS DOUBLE) * CAST($sq AS DOUBLE))"

  // ---------------------------------------------------------------- OLS

  private val slopeExpr =
    s"CAST(round(${cm("sxy", "sx", "sy")} / ${cm("sxx", "sx", "sx")} " +
      "* 1000000) AS BIGINT)"
  private val interceptExpr =
    s"CAST(round((CAST(sy AS DOUBLE) - ${cm("sxy", "sx", "sy")} / " +
      s"${cm("sxx", "sx", "sx")} * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) " +
      "* 1000000) AS BIGINT)"
  private val r2Expr =
    s"CAST(round(${cm("sxy", "sx", "sy")} * ${cm("sxy", "sx", "sy")} / " +
      s"(${cm("sxx", "sx", "sx")} * ${cm("syy", "sy", "sy")}) " +
      "* 1000000) AS BIGINT)"

  /** Per-group simple OLS: fit price_cents ~ a + b·quantity separately
    * for every supplier nation — the "grouped regression" a segmented
    * pricing analysis runs. One broadcast dim chain (supplier→nation)
    * hangs off the fact scan, then ONE partial+final aggregate carries
    * five exact sufficient sums per nation; slope/intercept/R² are
    * arithmetic on the 25-row result. Adding groups never adds a pass:
    * the per-group state is 5 numbers, so a million segments cost a
    * million tiny rows, not a million scans.
    *
    * Shape at 100 TB: fact-side map work is a two-column projection +
    * broadcast hash join (no shuffle until the 5-sum aggregate, which
    * is map-side combined); the solve runs on a nation-sized frame.
    */
  def olsByGroup(
      lineitem: DataFrame,
      supplier: DataFrame,
      nation: DataFrame): DataFrame = {
    val suppNation = supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("nation"))
    lineitem
      .select(col("l_suppkey"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("x"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x * x AS DECIMAL(38,0))")).as("sxx"),
        sum(expr("CAST(x * y AS DECIMAL(38,0))")).as("sxy"),
        sum(expr("CAST(y * y AS DECIMAL(38,0))")).as("syy"))
      .selectExpr("nation", "n",
        s"$slopeExpr AS slope_e6",
        s"$interceptExpr AS intercept_e6",
        s"$r2Expr AS r2_e6")
      .orderBy(col("nation"))
  }

  /** DuckDB oracle for [[olsByGroup]] — identical sums (HUGEINT-exact by
    * promotion) through the character-identical slope/intercept/R²
    * literals.
    */
  def olsByGroupOracleSql: String =
    s"""WITH f AS (
       |  SELECT n.n_name AS nation,
       |    round(l.l_quantity)::BIGINT AS x,
       |    round(l.l_extendedprice * 100)::BIGINT AS y
       |  FROM lineitem l
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey),
       |g AS (
       |  SELECT nation, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
       |    sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
       |  FROM f GROUP BY nation)
       |SELECT nation, n::BIGINT AS n,
       |  $slopeExpr AS slope_e6,
       |  $interceptExpr AS intercept_e6,
       |  $r2Expr AS r2_e6
       |FROM g ORDER BY nation""".stripMargin

  /** SIMPSON'S-PARADOX DETECTOR: the discount→quantity slope computed
    * overall AND within each returnflag stratum, with a per-stratum
    * sign-flip flag — the aggregation trap every metrics platform should
    * test for before reporting a pooled trend (a pooled positive slope
    * with all-negative strata means the pooled number is confounded by
    * stratum composition, not evidence).
    *
    * Shape: the SAME one-pass 5-sum aggregate as [[olsByGroup]], run
    * once grouped and once global (two aggregates over one projection);
    * the comparison is a broadcast of the 1-row overall slope. Exact
    * sums; slope literals identical to the grouped-OLS plane.
    */
  def simpsonsCheck(lineitem: DataFrame): DataFrame = {
    val prepped = lineitem.select(col("l_returnflag").as("segment"),
      expr("CAST(round(l_discount * 100) AS BIGINT)").as("x"),
      expr("CAST(round(l_quantity) AS BIGINT)").as("y"))
    def sums(df: DataFrame, keys: Seq[String]): DataFrame = {
      val g = if (keys.isEmpty) df.groupBy() else df.groupBy(keys.map(col): _*)
      g.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("CAST(x * x AS DECIMAL(38,0))")).as("sxx"),
        sum(expr("CAST(x * y AS DECIMAL(38,0))")).as("sxy"))
    }
    val grouped = sums(prepped, Seq("segment"))
      .selectExpr("segment", "n", s"$slopeExpr AS slope_e6")
    val overall = sums(prepped, Seq.empty)
      .selectExpr(s"$slopeExpr AS overall_slope_e6")
    grouped.crossJoin(broadcast(overall))
      .withColumn("sign_flip",
        (col("slope_e6") > 0) =!= (col("overall_slope_e6") > 0))
      .orderBy(col("segment"))
  }

  /** DuckDB oracle for [[simpsonsCheck]] — identical sums and slope
    * literals, grouped and global.
    */
  def simpsonsCheckOracleSql: String =
    s"""WITH p AS (
       |  SELECT l_returnflag AS segment,
       |    CAST(round(l_discount * 100) AS BIGINT) AS x,
       |    CAST(round(l_quantity) AS BIGINT) AS y
       |  FROM lineitem),
       |grouped AS (
       |  SELECT segment, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
       |    sum(x * x) AS sxx, sum(x * y) AS sxy
       |  FROM p GROUP BY segment),
       |overall AS (
       |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
       |    sum(x * x) AS sxx, sum(x * y) AS sxy
       |  FROM p),
       |gs AS (SELECT segment, n::BIGINT AS n, $slopeExpr AS slope_e6 FROM grouped),
       |os AS (SELECT $slopeExpr AS overall_slope_e6 FROM overall)
       |SELECT segment, n, slope_e6, overall_slope_e6,
       |  ((slope_e6 > 0) <> (overall_slope_e6 > 0)) AS sign_flip
       |FROM gs CROSS JOIN os ORDER BY segment""".stripMargin

  // --------------------------------------------------- correlation matrix

  /** The four lineitem measures the matrix covers, as (name, integer
    * quantization expression) — shared by both engines.
    */
  private val corrVars: Seq[(String, String)] = Seq(
    "discount_e2" -> "CAST(round(l_discount * 100) AS BIGINT)",
    "price_cents" -> "CAST(round(l_extendedprice * 100) AS BIGINT)",
    "quantity" -> "CAST(round(l_quantity) AS BIGINT)",
    "tax_e2" -> "CAST(round(l_tax * 100) AS BIGINT)")

  private def corrExpr(a: Int, b: Int): String =
    s"CAST(round(${cm(s"s$a$b", s"s$a", s"s$b")} / " +
      s"sqrt(${cm(s"s$a$a", s"s$a", s"s$a")} * " +
      s"${cm(s"s$b$b", s"s$b", s"s$b")}) * 1000000) AS BIGINT)"

  /** Pairwise Pearson correlation matrix over k=4 lineitem measures in
    * ONE aggregation pass: the k sums and k(k+1)/2 cross-sums are a
    * commutative monoid (14 numbers of state total), so map-side partial
    * aggregation does all the distributed work regardless of row count;
    * the 6 upper-triangle correlations are then arithmetic on a single
    * row, unpivoted to (var_a, var_b, corr_e6) rows. The naive
    * alternative — one `corr()` job per pair — scans the fact table
    * k(k−1)/2 times; this scans once, and stays one scan at k=100.
    */
  def corrMatrix(lineitem: DataFrame): DataFrame = {
    val prepped = lineitem.selectExpr(
      corrVars.zipWithIndex.map { case ((_, e), i) => s"$e AS m$i" }: _*)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
        corrVars.indices.map(i => sum(col(s"m$i")).as(s"s$i")) ++
        (for (i <- corrVars.indices; j <- corrVars.indices if i <= j)
          yield sum(expr(s"CAST(m$i * m$j AS DECIMAL(38,0))")).as(s"s$i$j"))
    val stats = prepped.agg(aggs.head, aggs.tail: _*)
    val pairs = for (i <- corrVars.indices; j <- corrVars.indices if i < j)
      yield (corrVars(i)._1, corrVars(j)._1, corrExpr(i, j))
    val stackArgs = pairs
      .map { case (a, b, e) => s"'$a', '$b', $e" }
      .mkString(", ")
    stats
      .selectExpr("n",
        s"stack(${pairs.size}, $stackArgs) AS (var_a, var_b, corr_e6)")
      .select(col("var_a"), col("var_b"), col("n"), col("corr_e6"))
      .orderBy(col("var_a"), col("var_b"))
  }

  /** DuckDB oracle for [[corrMatrix]] — the identical one-pass sums, six
    * UNION ALL'd pair rows through the character-identical correlation
    * literal.
    */
  def corrMatrixOracleSql: String = {
    val proj = corrVars.zipWithIndex
      .map { case ((_, e), i) => s"$e AS m$i" }.mkString(", ")
    val sums =
      corrVars.indices.map(i => s"sum(m$i) AS s$i").mkString(", ") + ", " +
        (for (i <- corrVars.indices; j <- corrVars.indices if i <= j)
          yield s"sum(m$i * m$j) AS s$i$j").mkString(", ")
    val rows = (for (i <- corrVars.indices; j <- corrVars.indices if i < j)
      yield s"SELECT '${corrVars(i)._1}' AS var_a, '${corrVars(j)._1}' AS var_b, " +
        s"n::BIGINT AS n, ${corrExpr(i, j)} AS corr_e6 FROM g")
      .mkString("\nUNION ALL\n")
    s"""WITH p AS (SELECT $proj FROM lineitem),
       |g AS (SELECT count(*) AS n, $sums FROM p)
       |$rows
       |ORDER BY var_a, var_b""".stripMargin
  }

  // ------------------------------------------------- mutual information

  /** The per-user feature bins the ranking scores, as (name, bin
    * expression over the per-user aggregate columns) — shared literals.
    */
  // floor() before the BIGINT cast: CAST(double AS BIGINT) truncates in
  // Spark but rounds in DuckDB — floor is the portable bin edge
  private val miFeatures: Seq[(String, String)] = Seq(
    "event_volume" -> "LEAST(9, CAST(floor(n_events / 20) AS BIGINT))",
    "type_breadth" -> "n_types",
    "value_decile" -> "LEAST(9, CAST(floor(sum_cents / 50000) AS BIGINT))")

  private val miTermExpr =
    "CAST(round(1000000 * (CAST(cxy AS DOUBLE) / CAST(n AS DOUBLE)) * " +
      "ln(CAST(n AS DOUBLE) * CAST(cxy AS DOUBLE) / " +
      "(CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)))) AS BIGINT)"

  /** Mutual-information feature ranking: I(label; feature) for three
    * binned per-user features against the error-share label
    * (5·n_errors ≥ n_events) — the screening pass that orders candidate
    * features before any model training. Each feature's MI is
    * Σ_{x,y} p(x,y)·ln(p(x,y)/(p(x)p(y))) over its (bin, label) joint
    * histogram; per-cell terms quantize to integer micro-nats BEFORE the
    * sum (the [[TextAnalysis]] log-prob discipline), so the total is an
    * order-free exact integer both engines agree on.
    *
    * Shape at 100 TB: one user-keyed aggregate collapses the corpus to a
    * user-dimension frame; each feature then reduces that to a ≤20-row
    * joint histogram — window marginals run on histogram-sized frames
    * only. Features share the single fact pass; adding a feature adds a
    * tiny histogram, not a scan.
    */
  def mutualInfo(events: DataFrame): DataFrame = {
    val users = events
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_errors"),
        countDistinct(col("event_type")).as("n_types"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
      .withColumn("label",
        when(col("n_errors") * 5 >= col("n_events"), 1L).otherwise(0L))
      .persist()
    val perFeature = miFeatures.map { case (name, binExpr) =>
      import org.apache.spark.sql.expressions.Window
      val joint = users
        .select(expr(binExpr).as("bin"), col("label"))
        .groupBy(col("bin"), col("label"))
        .agg(count(lit(1)).as("cxy"))
      // histogram-sized frame (≤ 20 rows): the global windows here run
      // over the collapsed joint table, never the corpus
      val withMargins = joint
        .withColumn("cx", sum(col("cxy")).over(Window.partitionBy(col("bin"))))
        .withColumn("cy", sum(col("cxy")).over(Window.partitionBy(col("label"))))
        .withColumn("n", sum(col("cxy")).over(Window.partitionBy()))
      withMargins
        .select(expr(miTermExpr).as("term_e6"))
        .agg(count(lit(1)).as("n_cells"), sum(col("term_e6")).as("mi_e6"))
        .select(lit(name).as("feature"), col("n_cells"), col("mi_e6"))
    }
    perFeature.reduce(_.union(_)).orderBy(col("feature"))
  }

  /** DuckDB oracle for [[mutualInfo]] — identical binning, marginals, and
    * micro-nat quantization per cell.
    */
  def mutualInfoOracleSql: String = {
    val features = miFeatures.map { case (name, binExpr) =>
      s"""SELECT '$name' AS feature, n_cells, mi_e6 FROM (
         |  SELECT count(*)::BIGINT AS n_cells, sum($miTermExpr)::BIGINT AS mi_e6
         |  FROM (
         |    SELECT cxy, sum(cxy) OVER (PARTITION BY bin) AS cx,
         |      sum(cxy) OVER (PARTITION BY label) AS cy,
         |      sum(cxy) OVER () AS n
         |    FROM (
         |      SELECT $binExpr AS bin, label, count(*) AS cxy
         |      FROM users GROUP BY 1, 2)))""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH users AS (
       |  SELECT user_id, count(*) AS n_events,
       |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors,
       |    count(DISTINCT event_type) AS n_types,
       |    sum(CAST(round(value * 100) AS BIGINT)) AS sum_cents,
       |    CASE WHEN sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 5
       |      >= count(*) THEN 1 ELSE 0 END AS label
       |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
       |$features
       |ORDER BY feature""".stripMargin
  }

  /** WEIGHT-OF-EVIDENCE / INFORMATION VALUE — the credit-scoring-era
    * feature screen next to [[mutualInfo]] (Siddiqi 2006): per spend
    * band b, WOE_b = ln(p_good,b / p_bad,b) says which way the band
    * votes, and IV = Σ_b (p_good,b − p_bad,b)·WOE_b summarizes the
    * band's separating power (rule of thumb: <0.02 useless, >0.5
    * suspicious). Same error-share label as the other model screens;
    * add-one smoothing on the dense band grid keeps empty bands finite;
    * per-band terms round at e6 then integer-sum (the established
    * float+round discipline).
    *
    * Shape at 100 TB: the [[mutualInfo]] discipline — one user collapse,
    * then a ≤10-row (band, label) histogram carries all the ln
    * arithmetic; the dense grid is a broadcast range frame.
    */
  def woeIv(events: DataFrame, nBins: Int = 10,
      bandCents: Int = 2000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = events
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_errors"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
      .select(
        expr(s"least(${nBins - 1}, greatest(0, sum_cents div $bandCents))")
          .as("bin"),
        when(col("n_errors") * 5 >= col("n_events"), 1L).otherwise(0L)
          .as("label"))
    val hist = users.groupBy(col("bin"))
      .agg(
        sum(lit(1L) - col("label")).as("g"),
        sum(col("label")).as("b"))
    // presence anchor: an empty corpus yields an empty report, not a
    // 10-row all-smoothing grid
    val anchor = broadcast(hist
      .agg(count(lit(1)).as("np")).filter(col("np") > 0))
    val dense = events.sparkSession.range(nBins).select(col("id").as("bin"))
      .crossJoin(anchor)
      .join(hist, Seq("bin"), "left")
      .na.fill(0L, Seq("g", "b"))
      .withColumn("gt", sum(col("g")).over(Window.partitionBy()))
      .withColumn("bt", sum(col("b")).over(Window.partitionBy()))
      .withColumn("pg", (col("g") + 1).cast("double") / (col("gt") + nBins))
      .withColumn("pb", (col("b") + 1).cast("double") / (col("bt") + nBins))
      .withColumn("woe_e6",
        round(log(col("pg") / col("pb")) * 1000000, 0).cast("long"))
      .withColumn("iv_term_e6",
        round((col("pg") - col("pb")) * log(col("pg") / col("pb")) * 1000000,
          0).cast("long"))
    dense
      .withColumn("iv_e6", sum(col("iv_term_e6")).over(Window.partitionBy()))
      .select(col("bin"), col("g").as("n_good"), col("b").as("n_bad"),
        col("woe_e6"), col("iv_term_e6"), col("iv_e6"))
      .orderBy(col("bin"))
  }

  /** DuckDB twin of [[woeIv]]. */
  def woeIvOracleSql(nBins: Int = 10, bandCents: Int = 2000): String =
    s"""WITH users AS (
       |  SELECT least(${nBins - 1}, greatest(0,
       |      sum(CAST(round(value * 100) AS BIGINT)) // $bandCents))::BIGINT
       |      AS bin,
       |    CASE WHEN sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |      * 5 >= count(*) THEN 1 ELSE 0 END AS label
       |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
       |hist AS (
       |  SELECT bin, sum(1 - label)::BIGINT AS g, sum(label)::BIGINT AS b
       |  FROM users GROUP BY bin),
       |dense AS (
       |  SELECT r.range::BIGINT AS bin, coalesce(h.g, 0) AS g,
       |    coalesce(h.b, 0) AS b
       |  FROM range($nBins) r
       |  CROSS JOIN (SELECT count(*) AS np FROM hist HAVING count(*) > 0) a
       |  LEFT JOIN hist h ON h.bin = r.range),
       |sm AS (
       |  SELECT bin, g, b,
       |    sum(g) OVER () AS gt, sum(b) OVER () AS bt
       |  FROM dense),
       |k AS (
       |  SELECT bin, g, b,
       |    (g + 1)::DOUBLE / (gt + $nBins) AS pg,
       |    (b + 1)::DOUBLE / (bt + $nBins) AS pb
       |  FROM sm)
       |SELECT bin, g AS n_good, b AS n_bad,
       |  round(ln(pg / pb) * 1000000, 0)::BIGINT AS woe_e6,
       |  round((pg - pb) * ln(pg / pb) * 1000000, 0)::BIGINT AS iv_term_e6,
       |  sum(round((pg - pb) * ln(pg / pb) * 1000000, 0))
       |    OVER ()::BIGINT AS iv_e6
       |FROM k ORDER BY bin""".stripMargin

  // ------------------------------------------------ isotonic calibration

  private val rangeMeanExpr =
    "(CAST(ps_hi - ps_lo AS DOUBLE) / CAST(pc_hi - pc_lo AS DOUBLE))"

  /** Isotonic calibration via the minimax characterization of the PAVA
    * fit: over score bins b with event count C_b and positive count S_b,
    * the monotone least-squares fit at bin p is
    * max_{i≤p} min_{j≥p} mean(S over [i,j]) — a closed form that needs
    * NO sequential pool-adjacent-violators loop, so it distributes: the
    * corpus collapses to B=50 bins in one aggregate, prefix sums give
    * every range mean from two lookups, and the B³ minimax refinement
    * (125k tiny rows) runs as two grouped aggregates over a
    * dimension-sized frame. Calibrating a score over 100 TB of events
    * costs one scan; everything after is model-sized.
    *
    * Exactness: range means are single IEEE divisions of exact integer
    * prefix sums (bit-identical across engines); min/max over exact
    * doubles is deterministic; output quantizes at e6. Monotonicity of
    * `fitted_e6` in `bin` is the spec's structural check.
    */
  def isotonicCalibration(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = events
      .select(
        expr("LEAST(49, CAST(floor(round(value * 100) / 1000) AS BIGINT))").as("bin"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("s"))
    // bin-dimension frame from here on (≤ 50 rows): the global window and
    // the range self-join are model-sized by construction
    val ord = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixed = bins
      .withColumn("ps", sum(col("s")).over(ord))
      .withColumn("pc", sum(col("c")).over(ord))
      .select(col("bin"), col("c"), col("s"), col("ps"), col("pc"))
    val lo = prefixed.select(col("bin").as("i"),
      (col("ps") - col("s")).as("ps_lo"), (col("pc") - col("c")).as("pc_lo"))
    val hi = prefixed.select(col("bin").as("j"),
      col("ps").as("ps_hi"), col("pc").as("pc_hi"))
    val ranges = lo.join(hi, col("i") <= col("j"))
      .select(col("i"), col("j"), expr(rangeMeanExpr).as("mean"))
    val p = prefixed.select(col("bin").as("p"), col("c").as("n_events"),
      col("s").as("n_pos"))
    val fitted = p
      .join(ranges, col("i") <= col("p") && col("j") >= col("p"))
      .groupBy(col("p"), col("n_events"), col("n_pos"), col("i"))
      .agg(min(col("mean")).as("minmean"))
      .groupBy(col("p"), col("n_events"), col("n_pos"))
      .agg(max(col("minmean")).as("fit"))
    fitted
      .select(col("p").as("bin"), col("n_events"), col("n_pos"),
        expr("CAST(round(fit * 1000000) AS BIGINT)").as("fitted_e6"))
      .orderBy(col("bin"))
  }

  /** DuckDB oracle for [[isotonicCalibration]] — the identical minimax
    * form over identical integer prefix sums.
    */
  def isotonicCalibrationOracleSql: String =
    s"""WITH b AS (
       |  SELECT LEAST(49, CAST(floor(round(value * 100) / 1000) AS BIGINT)) AS bin,
       |    count(*) AS c,
       |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
       |  FROM events GROUP BY 1),
       |pre AS (
       |  SELECT bin, c, s,
       |    sum(s) OVER (ORDER BY bin) AS ps,
       |    sum(c) OVER (ORDER BY bin) AS pc
       |  FROM b),
       |ranges AS (
       |  SELECT lo.bin AS i, hi.bin AS j,
       |    lo.ps - lo.s AS ps_lo, lo.pc - lo.c AS pc_lo,
       |    hi.ps AS ps_hi, hi.pc AS pc_hi
       |  FROM pre lo JOIN pre hi ON lo.bin <= hi.bin),
       |m AS (SELECT i, j, $rangeMeanExpr AS mean FROM ranges),
       |inner_min AS (
       |  SELECT p.bin AS p, p.c AS n_events, p.s AS n_pos, m.i,
       |    min(m.mean) AS minmean
       |  FROM pre p JOIN m ON m.i <= p.bin AND m.j >= p.bin
       |  GROUP BY 1, 2, 3, 4)
       |SELECT p AS bin, n_events::BIGINT AS n_events, n_pos::BIGINT AS n_pos,
       |  CAST(round(max(minmean) * 1000000) AS BIGINT) AS fitted_e6
       |FROM inner_min GROUP BY 1, 2, 3 ORDER BY bin""".stripMargin
}
