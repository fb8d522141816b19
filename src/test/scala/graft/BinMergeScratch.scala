package graft

import org.apache.spark.sql.SparkSession

/** One-off attribution of the 20k-bin APPEND cost (test scope): builds the
  * same 20k-bin tree as the bench's `restructure_bins` section, then times
  * the pieces of the merge path separately — the existing-bin probe, the
  * 20k-file CSV scan (multiLine on/off), and the full merge run — so the
  * append row's per-bin constant is attributed to a stage, not guessed.
  */
object BinMergeScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val users = 200; val hours = 100; val rowsPerBin = 20
    val n = users * hours * rowsPerBin
    val schemaJson =
      """{"type":"record","name":"EventRecord","fields":[
        |{"name":"key","type":{"type":"record","name":"K","fields":[
        |  {"name":"projectId","type":["null","string"],"default":null},
        |  {"name":"userId","type":"string"},{"name":"sourceId","type":"string"}]}},
        |{"name":"value","type":{"type":"record","name":"V","fields":[
        |  {"name":"time","type":"double"},{"name":"eventType","type":"string"},
        |  {"name":"value","type":"double"}]}}]}""".stripMargin
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val work = java.nio.file.Files.createTempDirectory("graft-binscratch")
    val counters = new Array[Long](16)
    def writeSlice(from: Int, until: Int): Unit = {
      val writers = (0 until 16).map { p =>
        val dir = work.resolve(s"in/events/partition=$p")
        java.nio.file.Files.createDirectories(dir)
        val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
          new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
        w.create(schema, dir.resolve(f"events+$p+${counters(p)}%010d.avro").toFile)
        w
      }
      (from until until).foreach { j =>
        val user = j % users; val hour = (j / users) % hours; val p = user % 16
        val k = new org.apache.avro.generic.GenericData.Record(schema.getField("key").schema)
        k.put("projectId", "bench"); k.put("userId", f"u$user%03d"); k.put("sourceId", "s0")
        val v = new org.apache.avro.generic.GenericData.Record(schema.getField("value").schema)
        v.put("time", 1.6e9 + hour * 3600.0 + (j / (users * hours)) % 3600)
        v.put("eventType", "bench"); v.put("value", j.toDouble)
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        rec.put("key", k); rec.put("value", v)
        writers(p).append(rec); counters(p) += 1
      }
      writers.foreach(_.close())
    }
    val cfg = graft.jobs.RestructureJobConfig(
      inputRoot = work.resolve("in").toString,
      outputRoot = work.resolve("out").toString,
      dedup = true, timeBinFormat = "yyyyMMdd_HH00")
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    writeSlice(0, (n * 0.8).toInt)
    t("cold-write")(graft.jobs.Restructure.run(spark, cfg))
    // the 20k committed bin paths
    val bins = {
      val out = work.resolve("out")
      java.nio.file.Files.walk(out).iterator()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(out).iterator().asScala
        .filter(p => p.toString.endsWith(".csv")).map(_.toString).toArray
    }
    println(s"SCRATCH bins=${bins.length}")
    t("scan-multiline-count")(
      spark.read.option("header", "true").option("inferSchema", "false")
        .option("multiLine", "true").option("escape", "\"").csv(bins.toSeq: _*).count())
    t("scan-plain-count")(
      spark.read.option("header", "true").option("inferSchema", "false")
        .option("escape", "\"").csv(bins.toSeq: _*).count())
    t("scan-multiline-count-2nd")(
      spark.read.option("header", "true").option("inferSchema", "false")
        .option("multiLine", "true").option("escape", "\"").csv(bins.toSeq: _*).count())
    // is the cost per-file or per-partition? repack with a tiny
    // openCostInBytes so ~all 20k files land in few partitions
    t("scan-multiline-lowopencost") {
      spark.conf.set("spark.sql.files.openCostInBytes", 128L)
      try spark.read.option("header", "true").option("inferSchema", "false")
        .option("multiLine", "true").option("escape", "\"").csv(bins.toSeq: _*).count()
      finally spark.conf.set("spark.sql.files.openCostInBytes", 4 * 1024 * 1024L)
    }
    // and with a long-string union-relevant projection only
    t("scan-multiline-maxpart") {
      spark.conf.set("spark.sql.files.openCostInBytes", 128L)
      spark.conf.set("spark.sql.files.maxPartitionBytes", 8L * 1024 * 1024)
      try spark.read.option("header", "true").option("inferSchema", "false")
        .option("multiLine", "true").option("escape", "\"").csv(bins.toSeq: _*).count()
      finally {
        spark.conf.set("spark.sql.files.openCostInBytes", 4 * 1024 * 1024L)
        spark.conf.set("spark.sql.files.maxPartitionBytes", 128L * 1024 * 1024)
      }
    }
    // raw-IO floor: what the same 20k files cost without the DataFrame
    // CSV source's per-file setup — an upper bound on what a bespoke
    // mapPartitions bin reader could recover
    t("raw-line-count")(
      spark.sparkContext.parallelize(bins.toSeq, 64).mapPartitions { it =>
        var n = 0L
        it.foreach { p =>
          val src = scala.io.Source.fromFile(p, "UTF-8")
          try n += src.getLines().size - 1 finally src.close()
        }
        Iterator(n)
      }.sum())
    writeSlice((n * 0.8).toInt, n)
    t("append-merge")(graft.jobs.Restructure.run(spark, cfg))
    org.apache.commons.io.FileUtils.deleteDirectory(work.toFile)
    spark.stop()
  }
}
