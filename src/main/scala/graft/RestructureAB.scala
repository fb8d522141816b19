package graft

import org.apache.spark.sql.SparkSession

/** Standalone runner for the bench's restructure jobs section, for
  * same-host A/B triage across commits (round-13's cold-throughput watch
  * item): runs ONLY the Avro-fixture setup + warm-up + N measured
  * cold-write/append sequences ([[Bench.prepareRestructure]] — the exact
  * code the full bench interleaves between query sweeps) and prints the
  * section JSON plus load markers. Keeping the harness identical on both
  * sides of an A/B (this file drops into the control checkout unchanged)
  * means the only variable is the commit under test. COMPILES AGAINST:
  * control commits at or after the round-14 visibility relaxation of
  * `Bench.prepareRestructure`/`RestructureBench` to `private[graft]`;
  * for OLDER control commits, also backport that one-line visibility
  * change (it does not touch measured code).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… SPARK_GRAFT_AB_RUNS=3 runMain graft.RestructureAB
  */
object RestructureAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_AB_RUNS", "3").toInt
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
    def dropCachedBlocks(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    val loadStart = loadAvg
    val rst = Bench.prepareRestructure(spark, sfDir)
    (1 to runs).foreach { _ =>
      dropCachedBlocks(); System.gc()
      rst.runMeasured()
    }
    val loadEnd = loadAvg
    def r2(x: Double): Double = math.rint(x * 100) / 100
    println(s"""{"restructure":${rst.toJson},""" +
      s""""load":{"start":${r2(loadStart)},"end":${r2(loadEnd)},"cpus":$cpus},""" +
      s""""sf":"$sfDir","runs":$runs}""")
    spark.stop()
  }
}
