package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** One-off per-job inventory of the streaming near-dedup micro-batch loop
  * (test scope, like [[PairCurve]]): runs the same full-corpus 10-batch
  * loop the bench's floor decomposition measures, with a listener tagging
  * every Spark job by its result-stage callsite, and prints an aggregated
  * table (signature → jobs/batch, total ms, ms/batch). The round-16 bench
  * put the loop at ~11.5 jobs/batch; this names them so each carries a
  * load-bearing-or-fusable verdict in PLANS.md and regressions in
  * BENCH_rN's standing `jobs_per_batch` metric are attributable.
  */
object StreamJobInventory {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, sfDir, "documents")
    val slices = 10
    def loop(tag: String): Unit = {
      val work = java.nio.file.Files.createTempDirectory(s"graft-jobinv-$tag")
      try (0 until slices).foreach { b =>
        val _ = graft.streaming.StreamingNearDedup.dedupBatch(
          docs.filter(pmod(col("doc_id"), lit(slices)) === b), b.toLong,
          work.toString, epoch = s"jobinv-$tag")
      } finally org.apache.commons.io.FileUtils.deleteDirectory(work.toFile)
    }
    loop("warm") // codegen/JIT outside the inventory
    // phase windows from the shipped step's own phaseSink (called at phase
    // END with the duration): a job is attributed to the phase whose
    // wall-clock window covers its start; async broadcast jobs share one
    // anonymous callsite, so the phase is most of their identity
    val windows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    // (startMs, signature, durMs) — attributed to phase windows AFTER the
    // loop (a job usually ends before its covering phase's window is
    // recorded, since phaseSink fires at phase end)
    val ended = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val last = js.stageInfos.sortBy(_.stageId).lastOption.map(_.name).getOrElse("?")
        val sig =
          if (last.contains("withThreadLocalCaptured")) "async broadcast/subquery job"
          else last
        starts.put(js.jobId, (js.time, sig))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) ended.add((s._1, s._2, je.time - s._1))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val work = java.nio.file.Files.createTempDirectory("graft-jobinv-measured")
    val t0 = System.nanoTime()
    try (0 until slices).foreach { b =>
      val _ = graft.streaming.StreamingNearDedup.dedupBatch(
        docs.filter(pmod(col("doc_id"), lit(slices)) === b), b.toLong,
        work.toString, epoch = "jobinv-measured",
        phaseSink = (n, s) => {
          val end = System.currentTimeMillis()
          windows.add((n, end - (s * 1000).toLong - 1, end + 1))
        })
    } finally org.apache.commons.io.FileUtils.deleteDirectory(work.toFile)
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // drain the async listener bus
    spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    val ws = windows.asScala.toSeq
    val agg = new java.util.HashMap[String, (Int, Long)]()
    ended.asScala.foreach { case (start, sig, dur) =>
      val phase = ws.collectFirst {
        case (n, from, to) if start >= from && start <= to => n
      }.getOrElse("plan-construction/other")
      agg.merge(s"[$phase] $sig", (1, dur), (a, b) => (a._1 + b._1, a._2 + b._2))
    }
    val rows = agg.asScala.toSeq.sortBy(-_._2._2)
    val totalJobs = rows.map(_._2._1).sum
    println(f"INVENTORY loop_wall=$wall%.2fs jobs=$totalJobs jobs_per_batch=${totalJobs.toDouble / slices}%.1f")
    rows.foreach { case (sig, (n, ms)) =>
      println(f"  ${n.toDouble / slices}%5.1f/batch ${ms.toDouble / slices}%7.1f ms/batch  $sig")
    }
    spark.stop()
  }
}
