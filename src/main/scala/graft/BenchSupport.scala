package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Shared measurement plumbing for [[Bench]] and [[Profile]] — ONE
  * implementation of the two pieces both mains need, so a fix to either
  * (listener drain timing, replication scheme) reaches both and the
  * Profile decomposition stays comparable to the bench artifact it
  * explains.
  */
private[graft] object BenchSupport {

  /** Per-query Spark job/stage/task counters + shuffle volume, fed by a
    * SparkListener. Listener events drain ASYNCHRONOUSLY after an action
    * returns — call [[settle]] before reading, and [[reset]] before the
    * measured work.
    */
  final class Counters {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); shufRead.set(0); shufWrite.set(0)
    }
    def settle(): Unit = Thread.sleep(150)
    def shufWriteMb: Double = math.rint(shufWrite.get / 1048576.0 * 10) / 10
    def shufReadMb: Double = math.rint(shufRead.get / 1048576.0 * 10) / 10
  }

  /** Attach a counter listener to `spark` (stays attached for the session —
    * the counters are reset per measurement, never detached).
    */
  def attachCounters(spark: SparkSession): Counters = {
    val c = new Counters
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { val _ = c.jobs.incrementAndGet() }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val _ = c.stages.incrementAndGet()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val _ = c.tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          val _ = c.shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          val _ = c.shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    c
  }

  /** WORKLOAD-HONEST replication of the documents + embeddings tables into
    * a temp directory: each replica gets a disjoint id space AND a disjoint
    * token space (every token suffixed per replica), so replication grows
    * the vocabulary/pair/cluster structure the way a bigger corpus does —
    * NOT `rep` exact copies, which would collapse under dedup and make
    * every near-dup operator look artificially fast. Caller owns (and
    * deletes) the returned directory.
    */
  def replicateCorpus(spark: SparkSession, sfDir: String, rep: Int,
      prefix: String): java.nio.file.Path = {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files.createTempDirectory(prefix)
    val docs = Tables.load(spark, sfDir, "documents")
    val embs = Tables.load(spark, sfDir, "embeddings")
    (0 until rep).map { r =>
      val d = docs.withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
      // replica 0 keeps the original text; others shift the token space
      if (r == 0) d
      else d.withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1x" + r))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    (0 until rep).map { r =>
      embs.withColumn("vec_id", col("vec_id") + lit(r * 10000000L))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    work
  }
}
