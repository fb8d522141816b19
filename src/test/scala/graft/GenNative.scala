package graft

import org.apache.spark.sql.SparkSession

/** Standalone ScaleGen runner (test scope): generate a native-sf dir for
  * local validation. Usage: Test/runMain graft.GenNative <outDir> <ratio>
  */
object GenNative {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val ratio = args(1).toDouble
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val t0 = System.nanoTime()
    ScaleGen.generate(spark, out, ratio, baseDir = base)
    println(f"[gen] wrote $out at ratio $ratio in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
