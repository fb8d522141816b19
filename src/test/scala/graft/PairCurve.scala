package graft
import org.apache.spark.sql.SparkSession

/** One-off scale-curve attribution tool (test scope, like [[Scratch]]):
  * regenerates the native ScaleGen points and counts the dedup family's
  * TRUE work measure — LSH candidate pairs and verified survivors — so a
  * wall-clock curve can be read against work volume instead of raw data
  * size. Round-16 measurement: docs 50k/150k/500k (ratio 10/30/100) →
  * minhash candidate pairs 63k/566k/6.23M — the pair graph grows ~98× for
  * 10× docs because one shared vocabulary densifies neighborhoods, so
  * q_corpus_dedup's 12× wall at 10× data is strongly SUB-linear in pairs.
  */
object PairCurve {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (ratio <- Seq(10.0, 30.0, 100.0)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-paircurve").toString
      ScaleGen.generate(spark, dir, ratio, baseDir = baseDir)
      val docs = Tables.load(spark, dir, "documents")
      val nDocs = docs.count()
      val pairs = SparkEntry.queries("q_minhash_pairs")(spark, dir).count()
      val verified = SparkEntry.queries("q_corpus_dedup")(spark, dir).count()
      println(s"CURVE ratio=$ratio docs=$nDocs minhash_pairs=$pairs corpus_dedup_rows=$verified")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    spark.stop()
  }
}
