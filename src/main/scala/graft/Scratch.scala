package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main (not part of the library): times a subset of
  * SparkEntry queries with the same warm+measure protocol as Bench.
  * Usage: runMain graft.Scratch q_minhash_pairs q_corpus_dedup
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => println(s"WARM FAIL $name: $e") }
    }
    names.foreach { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => println(s"FAIL $name: $e") }
      println(f"QUERY $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    spark.stop()
  }
}
