package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quick streaming-floor decomposition runner (test scope — iteration tool
  * behind Bench's floor_decomposition artifact row): warm loop + N
  * instrumented 10-batch loops over the sf documents table, printing
  * per-phase per-batch walls from dedupBatch's phaseSink.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… Test/runMain graft.StreamFloor [loops]
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loops = if (args.nonEmpty) args(0).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_FLOOR_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val allDocs = Tables.load(spark, sfDir, "documents")
    // SPARK_GRAFT_FLOOR_SCALE=1 → quarter corpus in 10 batches (the
    // floor-bound small-batch shape); default 4 → full corpus
    val scale = sys.env.getOrElse("SPARK_GRAFT_FLOOR_SCALE", "4")
    val (docs, mod) =
      if (scale == "1") (allDocs.filter(pmod(col("doc_id"), lit(40)) < 10), 40)
      else (allDocs, 10)
    val slices = 10
    def loop(tag: String, sink: (String, Double) => Unit): Double = {
      val work = java.nio.file.Files.createTempDirectory(s"graft-streamfloor-$tag")
      try {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        System.gc()
        val t0 = System.nanoTime()
        (0 until slices).foreach { b =>
          val _ = graft.streaming.StreamingNearDedup.dedupBatch(
            docs.filter(pmod(col("doc_id"), lit(mod)) === b), b.toLong,
            work.toString, epoch = s"floor-$tag", phaseSink = sink)
        }
        (System.nanoTime() - t0) / 1e9
      } finally org.apache.commons.io.FileUtils.deleteDirectory(work.toFile)
    }
    // per-phase Spark JOB counts: phases are sequential inside a batch, so
    // cumulative-count deltas at phase ends attribute jobs to phases
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
    })
    val warmWall = loop("warm", (_, _) => ())
    println(f"[floor] warm loop: $warmWall%.2f s")
    (1 to loops).foreach { i =>
      val totals = scala.collection.mutable.LinkedHashMap[String, Double]()
      val jobs = scala.collection.mutable.LinkedHashMap[String, Int]()
      var lastCount = jobCount.get()
      val wall = loop(s"m$i", { (n, s) =>
        totals(n) = totals.getOrElse(n, 0.0) + s
        val c = jobCount.get()
        jobs(n) = jobs.getOrElse(n, 0) + (c - lastCount)
        lastCount = c
      })
      val attributed = totals.values.sum
      val parts = (totals.toSeq :+ ("other" -> (wall - attributed)))
        .map { case (n, s) => f"$n=${s / slices}%.3f" }.mkString(" ")
      val jobParts = jobs.toSeq.map { case (n, c) => f"$n=${c.toDouble / slices}%.1f" }.mkString(" ")
      println(f"[floor] loop $i: wall=$wall%.2f s per-batch: $parts")
      println(f"[floor] loop $i jobs/batch: $jobParts")
    }
    spark.stop()
  }
}
