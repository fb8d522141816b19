package graft

import org.apache.spark.sql.SparkSession

/** Same-window reconciliation of q_tfidf's two 10× measurement channels
  * (round-14 verdict task #1): the bench's sf1x10 `once()` path (gc before
  * the clock, plain count) and the Profile per-job-wall path (counters
  * reset + settle around the count) run ALTERNATING in one JVM over ONE
  * shared replicated corpus, min-of-N each, with the DuckDB oracle swept in
  * the same window. If the committed artifact's 1.39 s vs the quiet-window
  * Profile's 0.82-0.92 s was harness cost, it reproduces here; if it was
  * window noise, the two channels agree within the in-sweep spread.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… Test/runMain graft.TfidfChannels [rounds]
  */
object TfidfChannels {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = if (args.nonEmpty) args(0).toInt else 4
    val name = sys.env.getOrElse("SPARK_GRAFT_CHANNEL_QUERY", "q_tfidf")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val counters = BenchSupport.attachCounters(spark)
    def dropCachedBlocks(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    val dir = BenchSupport.replicateCorpus(spark, sfDir, 10, "graft-tfidf-ab",
      withTpch = true).toString
    val q = SparkEntry.queries(name)
    println(f"[ab] load at start: $loadAvg%.1f")
    // one warm pass: the bench reaches its 10x section with the plan shape
    // already hot from the sf0.1 sweeps; Profile warms explicitly — warm
    // once so NEITHER channel's table rows pay JIT
    val _ = q(spark, dir).count()

    def benchStyle(): Double = {
      dropCachedBlocks(); System.gc()
      val t0 = System.nanoTime()
      val _ = q(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def profStyle(): (Double, Int, Double, Double) = {
      dropCachedBlocks()
      counters.reset()
      val t0 = System.nanoTime()
      val _ = q(spark, dir).count()
      val elapsed = (System.nanoTime() - t0) / 1e9
      counters.settle()
      (elapsed, counters.jobs.get, counters.shufReadMb, counters.shufWriteMb)
    }
    val bench = scala.collection.mutable.ArrayBuffer.empty[Double]
    val prof = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to rounds).foreach { i =>
      val b = benchStyle(); bench += b
      val (p, jobs, sr, sw) = profStyle(); prof += p
      println(f"[ab] round $i: bench=$b%.3f s  profile=$p%.3f s " +
        f"(jobs=$jobs shufR=$sr%.1f shufW=$sw%.1f MiB)  load=$loadAvg%.1f")
    }
    // oracle, same window, same corpus
    val oracle = Bench.runOracleSweep(dir,
      Map(name -> SparkEntry.oracleSql(name)), passes = rounds)
    println(s"[ab] oracle: $oracle")
    println(f"[ab] bench  passes: ${bench.map(t => f"$t%.3f").mkString(",")}  min=${bench.min}%.3f")
    println(f"[ab] profile passes: ${prof.map(t => f"$t%.3f").mkString(",")}  min=${prof.min}%.3f")
    println(f"[ab] load at end: $loadAvg%.1f")
    try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    catch { case _: Throwable => }
    spark.stop()
  }
}
