package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew and co-location utilities — the join-shape toolbox for 100 TB
  * (SURVEY §4.2; none of this exists in the reference, which delegates
  * all physical planning to BigQuery/Dataflow).
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) which splits oversized post-shuffle partitions. These
  * helpers cover the cases AQE can't fix:
  *  - a single join KEY too hot for any partition split → [[saltedJoin]]
  *    spreads one key over `salts` partitions by replicating the build
  *    side;
  *  - repeated equi-joins/aggs on the same key → bucketed tables
  *    ([[writeBucketed]]) make the shuffle a one-time write-side cost.
  */
object Skew {

  /** Equi-join `big` (skewed) with `small` on `keys` (bigKey -> smallKey),
    * spreading each hot key across `salts` shuffle partitions: the big
    * side gets a random salt in [0, salts), the small side is replicated
    * once per salt value. Result equals a plain inner join.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: (String, String),
      salts: Int = 8): DataFrame = {
    require(salts > 0)
    val (bigKey, smallKey) = keys
    val saltedBig = big.withColumn("__salt", (rand(42) * salts).cast("int"))
    val explodedSmall = small.withColumn(
      "__salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(explodedSmall,
        saltedBig(bigKey) === explodedSmall(smallKey) &&
          saltedBig("__salt") === explodedSmall("__salt"))
      .drop("__salt")
  }

  /** Same-name-key convenience overload. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame =
    saltedJoin(big, small.withColumnRenamed(key, s"__sk_$key"), key -> s"__sk_$key", salts)
      .drop(s"__sk_$key")

  /** Persist `df` as a bucketed+sorted table: subsequent equi-joins and
    * aggregations on `key` between same-bucketed tables plan with ZERO
    * exchanges (verified in SkewSpec). This is the batch answer to "the
    * corpus is joined on doc_id every day".
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
