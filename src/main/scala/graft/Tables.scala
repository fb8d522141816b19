package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** `events.parquet` stores TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; read nanos as long and truncate to microsecond TimestampType
    * (same truncation DuckDB applies when formatting with `%f`).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000").cast(LongType)))
  }
}
