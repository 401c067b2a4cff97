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
}
