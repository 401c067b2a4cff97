package graft

import graft.functions.GraftExtensions

class GraftExtensionsSpec extends SparkTestBase {

  test("native expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT float_vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)

    val sh = spark.sql(
      "SELECT word_shingles(array('a','b','c','b','c'), 2) AS s")
      .head().getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c b"))

    val score = spark.sql(
      "SELECT quality_score('u7', 'hello', 2.5d, '2024-01-01T00:00:00Z') AS q")
      .head().getInt(0)
    assert(score == 100)

    val scoreLow = spark.sql(
      "SELECT quality_score('unknown', '', 0.0d, '2024-01-01T00:00:00Z') AS q")
      .head().getInt(0)
    assert(scoreLow == 25)

    // signature functions compose in SQL
    val sim = spark.sql(
      """SELECT simhash64(transform(array('x','y'), t -> xxhash64(t))) AS s,
        |       minhash_sig(transform(array('x','y'), t -> xxhash64(t)), 4) AS m
        |""".stripMargin).head()
    assert(sim.getSeq[Long](1).length == 4)

    // replicable hash family: scalar ≡ array form, SQL-callable
    val ph = spark.sql(
      """SELECT poly_hash('abc', 31L, 1000000007L) AS h1,
        |       poly_hash('abc', 131L, 1000000009L) AS h2,
        |       poly_hash_array(array('abc'))[0] AS packed""".stripMargin).head()
    assert(ph.getLong(2) == (ph.getLong(0) | (ph.getLong(1) << 30)))
  }

  test("extensions class injects the same functions into a fresh session") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // keep the shared session alive
    // getOrCreate only applies extensions when it actually creates a
    // session — clear the default so a new one (same context) is built
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .appName("graft-ext-test")
        .getOrCreate()
      val d = s2.sql("SELECT float_vec_dot(array(1.0f), array(5.0f)) AS d")
        .head().getDouble(0)
      assert(d == 5.0)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("collated comparison and grouping fold case (Spark 4 collation surface)") {
    // the engine-surface pin for COLLATE: UTF8_LCASE equality and
    // grouping treat 'Web'/'WEB'/'web' as one key without lower() calls
    val out = spark.sql(
      """SELECT src COLLATE UTF8_LCASE AS k, count(*) AS n
        |FROM VALUES ('Web'), ('WEB'), ('web'), ('Books') AS t(src)
        |GROUP BY k ORDER BY n DESC""".stripMargin).collect()
      .map(r => (r.getString(0).toLowerCase, r.getLong(1)))
    assert(out.toSeq == Seq(("web", 3L), ("books", 1L)))
    assert(spark.sql("SELECT 'AbC' COLLATE UTF8_LCASE = 'abc'").head().getBoolean(0))
  }
}
