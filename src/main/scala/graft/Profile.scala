package graft

import org.apache.spark.sql.SparkSession

/** Query profiler: per-query Spark job/stage/task counts and shuffle volume,
  * the numbers that explain a wall-time gap better than wall time does. A
  * sub-second query at 3× the oracle is EITHER paying the ~0.2 s/job
  * scheduling floor several times over (job count high, shuffle small — the
  * gap amortizes at scale) or moving too much data (shuffle bytes high — the
  * gap widens at scale); this tool tells the two apart. The counters and the
  * replicated corpus come from [[BenchSupport]] — the SAME plumbing the
  * bench artifact's profile section uses, so the decomposition here is
  * directly comparable to any committed snapshot.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.Profile q_tfidf q_bigram_logprob
  * Prints one line per query: passes(sec), jobs, stages, tasks, shuffle
  * read/write MiB — plus a formatted plan dump under /tmp/graft-plans/.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val counters = BenchSupport.attachCounters(spark)

    def dropCachedBlocks(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted

    // SPARK_GRAFT_REPLICATE=10: profile against the same workload-honest
    // replicated corpus the bench's sf1x10 section uses (disjoint id+token
    // space per replica — BenchSupport.replicateCorpus, shared with Bench),
    // so a 10× ratio can be decomposed into jobs vs data here before
    // touching the query.
    val rep = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "1").toInt
    val dir = if (rep <= 1) sfDir
      else BenchSupport.replicateCorpus(spark, sfDir, rep, "graft-prof-rep",
        withTpch = true).toString
    val planDir = new java.io.File("/tmp/graft-plans")
    val _ = planDir.mkdirs()
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      // plan dump from a fresh build (pre-execution, so AQE markers only)
      val planFile = new java.io.File(planDir, s"$name.txt")
      val pw = new java.io.PrintWriter(planFile)
      try pw.println(q(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      finally pw.close()
      // warm pass (codegen+JIT), then measured passes with counters
      dropCachedBlocks()
      try { val _ = q(spark, dir).count() } catch { case _: Throwable => }
      val times = (1 to passes).map { _ =>
        dropCachedBlocks()
        counters.reset()
        val t0 = System.nanoTime()
        try { val _ = q(spark, dir).count() } catch {
          case e: Throwable => Console.err.println(s"[prof] FAILED $name: ${e.getMessage}")
        }
        val elapsed = (System.nanoTime() - t0) / 1e9
        counters.settle()
        elapsed
      }
      println(f"$name%-24s passes=${times.map(t => f"$t%.3f").mkString(",")}  " +
        f"jobs=${counters.jobs.get}%-3d stages=${counters.stages.get}%-3d tasks=${counters.tasks.get}%-5d " +
        f"shufR=${counters.shufReadMb}%6.1f MiB shufW=${counters.shufWriteMb}%6.1f MiB  plan=$planFile")
    }
    if (dir != sfDir)
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      catch { case _: Throwable => }
    spark.stop()
  }
}
