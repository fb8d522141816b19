package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.jobs.{Restructure, RestructureJobConfig, TopicJobConfig}
import graft.sources.AvroRead

/** Structured-Streaming form of the restructure pipeline (§2.9 of
  * SURVEY.md): `readStream` file source → derived bin path →
  * per-micro-batch exactly-named bin commit via `foreachBatch`.
  *
  * Semantics matched to the reference service loop:
  *  - conflated fixed-interval trigger ↔ `Trigger.ProcessingTime` (or
  *    `AvailableNow` for a drain run, which is exactly the reference's
  *    one-shot mode);
  *  - NO watermark on the restructure path — late records are never
  *    dropped, they land in their (old) time bin, `unknown-time` if absent;
  *  - exactly-once from the checkpoint's file-source log (the offset-ledger
  *    analog); bins are merge-rewritten idempotently.
  */
object StreamingRestructure {

  /** Start a streaming restructure of `source` (a streaming DataFrame).
    * `pathCol` is the compiled template expression over the source schema.
    */
  def start(
      spark: SparkSession, source: DataFrame, pathCol: Column,
      cfg: RestructureJobConfig, topic: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val dataSchema = source.schema
    source.writeStream
      .queryName(s"graft-restructure-$topic")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, cfg, topic, batch, dataSchema, pathCol, batchId)
        ()
      }
      .start()
  }

  /** One micro-batch: stamp provenance (batch id ↔ source file, row pos),
    * then reuse the batch bin writer (merge-with-existing, dedup, one file
    * per bin, sidecar-free).
    */
  private[graft] def processBatch(
      spark: SparkSession, cfg: RestructureJobConfig, topic: String,
      batch: DataFrame, dataSchema: StructType, pathCol: Column, batchId: Long): Seq[String] = {
    val fs = new HPath(cfg.outputRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.setWriteChecksum(false)
    fs.setVerifyChecksum(false)
    val stamped = batch
      .withColumn(AvroRead.FileCol, lit(f"batch-$batchId%012d"))
      .withColumn(AvroRead.PosCol, monotonically_increasing_id())
    if (cfg.format == "json")
      Restructure.writeJsonBins(spark, cfg, fs, topic, stamped, dataSchema, pathCol,
        cfg.topicConfig(topic))
    else
      Restructure.writeCsvBins(spark, cfg, fs, topic, stamped, dataSchema, pathCol,
        cfg.topicConfig(topic))
  }
}
