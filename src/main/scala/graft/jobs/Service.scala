package graft.jobs

import org.apache.spark.sql.SparkSession

/** Service mode (§3.3 of SURVEY.md): fixed-interval conflated job loop —
  * restructure and cleaner never overlap (the reference serializes them via
  * a shared mutex, worker/Job.kt:26-49; a single driver loop gives the same
  * guarantee). Errors are caught and logged per iteration; the loop never
  * dies.
  */
object Service {

  final case class ServiceConfig(
      intervalMs: Long = 300000L,            // service.interval default 300 s
      cleanerEnabled: Boolean = false,
      cleanerAgeMs: Long = 7L * 24 * 3600 * 1000,
      // source.index.fullSyncInterval. Default 0 = fresh listing every
      // iteration (no staleness); set higher only when listing cost
      // dominates and up-to-interval-delayed pickup is acceptable.
      fullSyncIntervalMs: Long = 0L,
      // worker.enable / --no-restructure: cleaner-only service loops
      restructureEnabled: Boolean = true,
      maxIterations: Option[Int] = None)     // bounded loops for tests

  def runLoop(spark: SparkSession, cfg: RestructureJobConfig, svc: ServiceConfig): Unit = {
    // S10: cached source listing between iterations, slow full-resync cadence
    val index = try {
      val inFs = new org.apache.hadoop.fs.Path(cfg.inputRoot)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Some(new graft.sources.StorageIndex(inFs, cfg.inputRoot, svc.fullSyncIntervalMs))
    } catch { case _: Exception => None }
    var iter = 0
    while (svc.maxIterations.forall(iter < _)) {
      val t0 = System.currentTimeMillis()
      try {
        if (svc.restructureEnabled) Restructure.run(spark, cfg, index.map(_.topics()))
        if (svc.cleanerEnabled) {
          Cleaner.run(spark, cfg, svc.cleanerAgeMs)
          index.foreach(_.invalidate()) // deletes change the tree
        }
      } catch {
        case e: Exception =>
          System.err.println(s"[graft-service] iteration $iter failed: ${e.getMessage}")
      }
      iter += 1
      if (svc.maxIterations.forall(iter < _)) {
        val elapsed = System.currentTimeMillis() - t0
        val sleep = svc.intervalMs - elapsed
        if (sleep > 0) Thread.sleep(sleep) // conflated: no overlap, no backlog
      }
    }
  }
}
