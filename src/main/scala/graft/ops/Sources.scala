package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema.EventSchema

/** Batch source/sink formats for the sink-schema event table. Every
  * reader takes the DECLARED schema (the reference's `autodetect: False`
  * stance, Streamingdag.py:320) — schema inference never touches the
  * data path. Parquet is the primary sink (stream/Pipeline); ORC is the
  * alternate columnar format; JSON-lines is the wire-compatible
  * interchange; CSV mirrors the reference's export (K3).
  */
object Sources {

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(EventSchema.sinkSchema).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(EventSchema.sinkSchema).orc(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      // CSV cannot carry types; pin a timestamp format so the read-back
      // with the declared schema is lossless to the second
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(EventSchema.sinkSchema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)
}
