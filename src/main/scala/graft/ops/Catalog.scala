package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema.EventSchema

/** Catalog DDL — the Spark twin of the reference's control-plane setup
  * (SURVEY §2.13: D3 create dataset, D4 create table with declared
  * schema; Streamingdag.py:99-137). The topic/subscription steps (D1/D2)
  * are source provisioning, outside the engine.
  */
object Catalog {

  /** D3: `CREATE DATABASE IF NOT EXISTS` (BigQuery dataset twin). */
  def ensureDatabase(spark: SparkSession, name: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$name`")

  /** D4: external parquet table over the sink path with the declared
    * 19-column schema — `autodetect: False` becomes an explicit
    * StructType, never inference.
    */
  def ensureEventsTable(
      spark: SparkSession,
      db: String,
      table: String,
      path: String): Unit = {
    ensureDatabase(spark, db)
    if (!spark.catalog.tableExists(s"$db.$table")) {
      spark.catalog.createTable(s"$db.$table", "parquet",
        EventSchema.sinkSchema, Map("path" -> path))
    }
  }

  def readTable(spark: SparkSession, db: String, table: String): DataFrame =
    spark.table(s"$db.$table")

  /** The reference's INFORMATION_SCHEMA.COLUMNS troubleshooting query
    * (reference README.md:257-263) as a catalog-metadata twin:
    * `column_name, data_type, is_nullable` for a registered table, in
    * BigQuery's YES/NO nullability convention. Pure metadata — reads
    * the catalog's declared StructType, never the data files.
    */
  def describeColumns(spark: SparkSession, db: String, table: String): DataFrame = {
    import spark.implicits._
    spark.table(s"$db.$table").schema.fields.toSeq
      .map(f => (f.name, f.dataType.sql, if (f.nullable) "YES" else "NO"))
      .toDF("column_name", "data_type", "is_nullable")
  }

  /** DATA-PROFILE REPORT — one row per column with the ingest-audit
    * basics (row count, null count, exact distinct count, rendered
    * min/max): the first query run against ANY newly landed table, and
    * the one every schema-drift / quality incident starts from. The
    * operator is schema-driven and generic: aggregates are generated
    * from the DataFrame's StructType, so it profiles any table.
    *
    * Cross-engine value rendering (min/max must hash-match the oracle):
    * integers and strings render verbatim, timestamps through
    * unix_micros, dates ISO, floating point at e2 (cent) integer
    * precision; unorderable types (arrays, structs) get NULL extrema.
    *
    * Shape: ONE scan. The k exact distinct aggregates plan as a single
    * Expand (k× the row stream under map-side partial aggregation) —
    * the exact form is the audit/oracle twin; at 100 TB swap
    * `countDistinct` for `approx_count_distinct` and the envelope
    * discipline (the [[graft.ops.Analytics.healthCheckApproxEnvelope]]
    * shape) — same report, sketch-sized state.
    */
  def profileTable(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val fields = df.schema.fields.toSeq
    def rendered(dt: DataType, c: Column): Option[Column] = dt match {
      case ByteType | ShortType | IntegerType | LongType |
           _: DecimalType => Some(c.cast("string"))
      case StringType => Some(c)
      case DateType => Some(c.cast("string"))
      case TimestampType => Some(unix_micros(c).cast("string"))
      case DoubleType | FloatType =>
        Some(round(c * 100).cast("long").cast("string"))
      case _ => None
    }
    // intermediate aliases are POSITIONAL (c0__nn …), never derived from
    // the user's column names: a field named `x'y` or `a``b` must not be
    // able to corrupt any generated identifier. Source columns resolve
    // through df(_) with backticks doubled (the one escape Spark's
    // attribute parser defines), and the unpivot is typed Columns —
    // explode over an array of structs, the codegen'd twin of stack()
    // with zero string interpolation to break.
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = df(s"`${f.name.replace("`", "``")}`")
      def mm(agg: Column): Column =
        rendered(f.dataType, agg).getOrElse(lit(null).cast("string"))
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"c${i}__nn"),
        countDistinct(c).as(s"c${i}__nd"),
        mm(min(c)).as(s"c${i}__mn"),
        mm(max(c)).as(s"c${i}__mx"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val entries = fields.zipWithIndex.map { case (f, i) =>
      struct(
        lit(f.name).as("column_name"),
        col(s"c${i}__nn").as("n_null"),
        col(s"c${i}__nd").as("n_distinct"),
        col(s"c${i}__mn").as("min_repr"),
        col(s"c${i}__mx").as("max_repr"))
    }
    one.select(col("__rows").as("n_rows"),
        explode(array(entries: _*)).as("e"))
      .select(col("e.column_name").as("column_name"), col("n_rows"),
        col("e.n_null").as("n_null"), col("e.n_distinct").as("n_distinct"),
        col("e.min_repr").as("min_repr"), col("e.max_repr").as("max_repr"))
      .orderBy(col("column_name"))
  }

  /** DuckDB oracle for [[profileTable]] over the events table — the six
    * per-column audits unioned, with the identical rendering rules.
    */
  def profileEventsOracleSql: String = {
    def row(name: String, mn: String, mx: String): String =
      s"""SELECT '$name' AS column_name,
         |  count(*)::BIGINT AS n_rows,
         |  sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
         |  count(DISTINCT $name)::BIGINT AS n_distinct,
         |  $mn AS min_repr, $mx AS max_repr
         |FROM events""".stripMargin
    def v(e: String) = (s"CAST(min($e) AS VARCHAR)", s"CAST(max($e) AS VARCHAR)")
    val (ei1, ei2) = v("event_id"); val (u1, u2) = v("user_id")
    val (t1, t2) = ("CAST(epoch_us(min(ts)) AS VARCHAR)",
      "CAST(epoch_us(max(ts)) AS VARCHAR)")
    val (va1, va2) = ("CAST(CAST(round(min(value) * 100) AS BIGINT) AS VARCHAR)",
      "CAST(CAST(round(max(value) * 100) AS BIGINT) AS VARCHAR)")
    Seq(
      row("event_id", ei1, ei2),
      row("ts", t1, t2),
      row("user_id", u1, u2),
      row("event_type", "min(event_type)", "max(event_type)"),
      row("value", va1, va2),
      row("props", "min(props)", "max(props)"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }
}
