package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated synthetic tables (see TESTDATA.md).
  * One parquet file per table under `sfDir`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The driver has generated `events.parquet` with different physical
    * types for `ts` across rounds: TIMESTAMP(NANOS) (which Spark's parquet
    * reader rejects without `nanosAsLong`), and plain TIMESTAMP(MICROS)
    * with isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ).
    * Normalize all of them to microsecond TimestampType — the session
    * timezone is pinned to UTC everywhere, so the NTZ cast is
    * value-identical to what DuckDB's naive-timestamp oracle computes.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Normalize `ts` to microsecond TimestampType whatever the physical
    * parquet type was (see [[events]]).
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long: truncate to micros
        df.withColumn("ts", timestamp_micros(expr("ts div 1000").cast(LongType)))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
}
