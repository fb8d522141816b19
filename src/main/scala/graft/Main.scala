package graft

import org.apache.spark.sql.SparkSession

import graft.jobs.{Cleaner, ConfigLoader, Restructure, Service}

/** CLI entry point — the reference's `radar-output-restructure [config.yml]`
  * surface (config/CommandLineArgs.kt): one-shot restructure (+cleaner) or
  * polling service mode, driven by a restructure.yml-compatible file.
  *
  * Usage: graft.Main <config.yml> [--service] [--clean] [--once]
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <config.yml> [--service|--clean|--once]")
    val yaml = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0))), "UTF-8")
    val loaded = ConfigLoader.load(yaml)
    val flags = args.drop(1).toSet

    val builder = SparkSession.builder()
      .appName("graft-restructure")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
    // local default; spark-submit --master overrides
    val spark = (if (sys.env.contains("MASTER")) builder
                 else builder.master(s"local[${Runtime.getRuntime.availableProcessors()}]"))
      .getOrCreate()
    loaded.hadoopConf.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
    // G6: instantiate enrichment-backed path plugins (e.g. `mp:`) now that a
    // session exists to broadcast their dimension tables
    val job = loaded.job.copy(pathPlugins = graft.paths.PathFormatterPlugin.fromNames(
      loaded.pathPluginNames, loaded.pathProperties))

    val cleanerAgeMs = loaded.cleanerAgeDays.toLong * 24 * 3600 * 1000
    if (loaded.serviceEnabled && flags.contains("--service")) {
      Service.runLoop(spark, job, Service.ServiceConfig(
        intervalMs = loaded.serviceIntervalSec * 1000,
        cleanerEnabled = loaded.cleanerEnabled,
        cleanerAgeMs = cleanerAgeMs))
    } else {
      val result = Restructure.run(spark, job)
      result.processedTopics.foreach { t =>
        println(s"[graft] ${t.topic}: ${t.files.size} files, ${t.records} records, ${t.paths.size} bins")
      }
      if (loaded.cleanerEnabled || flags.contains("--clean")) {
        val c = Cleaner.run(spark, job, cleanerAgeMs)
        println(s"[graft] cleaner: deleted ${c.deleted.size}, rolled back ${c.rolledBack.size}")
      }
    }
    spark.stop()
  }
}
