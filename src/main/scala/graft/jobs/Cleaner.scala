package graft.jobs

import java.time.Instant

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.paths.PathTemplate
import graft.sources.{AvroRead, TopicFiles}
import graft.time.TimeExtract

/** The cleaner job (§3.2 / §2.6 of SURVEY.md): delete source Avro files whose
  * records are verifiably present in the output.
  *
  *  - C1 eligibility: file older than `ageMs` AND the ledger also covers
  *    `to+1` (a later offset was processed — the newest file is never
  *    deleted, cleaner/SourceDataCleaner.kt:106-113).
  *  - C2 verification: re-derive every record's (bin path, time) and
  *    anti-join against the distinct time values of the target bins
  *    (timestamp-set containment, cleaner/TimestampExtractionCheck.kt) —
  *    one distributed join per topic instead of per-record file reads.
  *  - C3 rollback: a file that fails verification has its range removed
  *    from the ledger so the next restructure run re-extracts it.
  */
object Cleaner {

  final case class CleanResult(deleted: Seq[String], rolledBack: Seq[String],
      failedTopics: Seq[(String, String)] = Nil)

  def run(spark: SparkSession, cfg: RestructureJobConfig, ageMs: Long = 7L * 24 * 3600 * 1000,
      // cleaner.maxFilesPerTopic (SourceDataCleaner.kt:39-40): cap the
      // files verified+deleted per topic per iteration
      maxFilesPerTopic: Option[Int] = None): CleanResult = {
    val fs = new HPath(cfg.outputRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.setWriteChecksum(false)
    fs.setVerifyChecksum(false)
    val store = cfg.ledgerStore()
    val ledger = store match {
      case Some(s) =>
        s.get(cfg.ledger).map(graft.ledger.OffsetRangeSet.fromJson)
          .getOrElse(new graft.ledger.OffsetRangeSet)
      case None => Restructure.loadLedger(fs, cfg.ledger)
    }
    val now = System.currentTimeMillis()
    val deleted = Seq.newBuilder[String]
    val rolledBack = Seq.newBuilder[String]

    val topics = TopicFiles.listTopicsAll(spark, cfg.inputRoot +: cfg.extraInputRoots)
    val fileLimit = maxFilesPerTopic.getOrElse(Int.MaxValue)
    // per-topic failure isolation (reference SourceDataCleaner.kt:67-69
    // warn-and-continue): one unreadable topic must not block deletion
    // across the rest of the store. A failed topic's files stay put and
    // re-verify next iteration.
    val failedTopics = Seq.newBuilder[(String, String)]
    for ((topic, files) <- topics.toSeq.sortBy(_._1)) {
      val tCfg = cfg.topicConfig(topic)
      if (!tCfg.exclude && !tCfg.excludeFromDelete) try {
        val eligible = files
          .map(st => (st, TopicFiles.parseFilename(st.getPath.getName)))
          .collect { case (st, Some(r)) => (st, r) }
          .filter { case (st, r) =>
            st.getLen > 0 &&
            (now - st.getModificationTime) >= ageMs &&
            r.to.isDefined && // open-ended file = newest slice, keep
            ledger.contains(r.topic, r.partition, r.from, r.to.get + 1,
              Instant.ofEpochMilli(st.getModificationTime))
          }
          .take(fileLimit)
        if (eligible.nonEmpty) {
          val missingByFile = graft.util.Timer.time("cleaner.contains")(
            verifyTopic(spark, cfg, topic, eligible.map(_._1.getPath.toString)))
          eligible.foreach { case (st, r) =>
            val name = st.getPath.getName
            if (missingByFile.getOrElse(name, 0L) == 0L) {
              // resolve the FS per file: roots may live on different stores
              graft.util.Timer.time("cleaner.delete")(st.getPath
                .getFileSystem(spark.sparkContext.hadoopConfiguration)
                .delete(st.getPath, false))
              deleted += st.getPath.toString
            } else {
              ledger.remove(r.topic, r.partition, r.from, r.to.get)
              rolledBack += st.getPath.toString
            }
          }
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          Console.err.println(
            s"[graft] cleaner failed on topic $topic: ${e.getClass.getSimpleName}: ${e.getMessage}")
          failedTopics += topic -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    }
    store match {
      case Some(s) => try s.set(cfg.ledger, ledger.toJson) finally s.close()
      case None => Restructure.saveLedger(fs, cfg.ledger, ledger)
    }
    CleanResult(deleted.result(), rolledBack.result(), failedTopics.result())
  }

  /** Count of not-yet-extracted records per source file name (0 = safe to
    * delete). Records without a time value count as extracted (A4 rule).
    */
  private def verifyTopic(
      spark: SparkSession, cfg: RestructureJobConfig, topic: String,
      files: Seq[String]): Map[String, Long] = {
    val tCfg = cfg.topicConfig(topic)
    val df = AvroRead.read(spark, files)
    val dataSchema = StructType(df.schema.fields.filterNot(f =>
      f.name == AvroRead.FileCol || f.name == AvroRead.PosCol))
    val timeCol = TimeExtract.timeColumn(dataSchema)
    val template = tCfg.pathTemplate.getOrElse(cfg.pathTemplate)
    val params = PathTemplate.fixedParams(dataSchema, timeCol, lit(topic),
      cfg.extension, cfg.timeBinFormat)
    val pathCol = PathTemplate.compile(template, params, Some(timeCol), Some(dataSchema))

    // persisted: read twice (distinct target paths + the anti-join count)
    val source = df.select(col(AvroRead.FileCol).as("__src"),
      pathCol.as("__path"), timeCol.as("__time"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val cleanupTemps = scala.collection.mutable.ArrayBuffer.empty[HPath]
    import spark.implicits._
    // The stored time field and its render-back-to-epoch-seconds converter,
    // in the SAME priority order as TimeExtract's chain — so the value
    // compared against __time is the one __time was derived from.
    val chain: Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)] = Seq(
      "value.time" -> (c => c.cast(DoubleType)),
      "key.timeStart" -> (c => c.cast(DoubleType)),
      "key.start" -> (c => c.cast(DoubleType) / 1000.0), // stored millis
      "value.dateTime" -> (c => to_timestamp(regexp_replace(c, "Z$", "")).cast(DoubleType)),
      "value.date" -> (c => to_date(c).cast(TimestampType).cast(DoubleType)),
      "value.timeReceived" -> (c => c.cast(DoubleType)),
      "value.timeCompleted" -> (c => c.cast(DoubleType)))
    val leaves = graft.model.Flatten.leafPaths(dataSchema).map(_._1)
    val timeField = chain.flatMap { case (n, conv) =>
      leaves.find(_.equalsIgnoreCase(n)).map(_ -> conv)
    }.headOption

    val outFs = new HPath(cfg.outputRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // cleaner.cache = target-side metadata work (reference: TimestampFileCache
    // loading, cleaner/TimestampFileCache.kt:39-68). The probe is
    // DISTRIBUTED, mirroring Restructure.mergeCommitBins: existence +
    // header reads run as one Spark job over the distinct bin paths, and
    // its result is consumed in chunks of cfg.mergeChunkBins — a
    // verification sweep over 10^7 existing bins never holds the full
    // path list on the driver. Missing-record counts are ADDITIVE across
    // chunks because chunks partition the bin space and every record
    // belongs to exactly one bin path.
    val confEntries = graft.sources.AvroRead.fsConfEntries(spark)
    val outputRoot = cfg.outputRoot
    val needHeader = !cfg.zip && cfg.format != "json"
    val probed = source.select(col("__path")).distinct().as[String].mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val conf = new org.apache.hadoop.conf.Configuration()
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val pfs = new HPath(outputRoot).getFileSystem(conf)
        it.flatMap { p =>
          val full = new HPath(s"$outputRoot/$p")
          if (!pfs.exists(full)) None
          else if (!needHeader) Some((p, ""))
          else Restructure.readHeaderLine(pfs, full).map(h => (p, h))
          // unreadable target: dropped — its records count as missing, so
          // the source file is kept (same outcome as the old None branch)
        }
      }
    }

    // One chunk's stored (__path, __time) frame: ONE distributed scan per
    // distinct CSV header (attempt files order columns differently) / one
    // overall for JSON, __path re-derived from input_file_name. Zip bins
    // stream into one temp directory first (Restructure.unzipBins) and
    // then ride the SAME per-header single scans — plan nodes per header,
    // not per bin. None = no readable target in this chunk (e.g. every
    // zip corrupt): the caller counts all of the chunk's records missing.
    def targetTimesFor(chunk: Seq[(String, String)]): Option[org.apache.spark.sql.DataFrame] = {
      val (name, conv) = timeField.get
      val schemeRe = "^[a-zA-Z0-9+.\\-]+:/+"
      val (scanRoot, suffix, headered) =
        if (!cfg.zip) (cfg.outputRoot, "", chunk)
        else {
          val tempRoot = s"${cfg.outputRoot}/.graft-unzip-${java.util.UUID.randomUUID()}"
          cleanupTemps += new HPath(tempRoot)
          val unz = Restructure.unzipBins(outFs, cfg.outputRoot, tempRoot,
            chunk.map(_._1), wantHeader = cfg.format != "json")
          // a zip that fails to stream is dropped — its records count as
          // missing, so the source file is kept
          (tempRoot, ".unz", unz.collect { case (p, Some(h)) => (p, h) })
        }
      if (headered.isEmpty) return None
      val rootNorm = outFs.makeQualified(new HPath(scanRoot)).toUri.getPath
        .stripSuffix("/") + "/"
      val pathFromFile = {
        val base = regexp_replace(
          regexp_replace(input_file_name(), schemeRe, "/"),
          "^" + java.util.regex.Pattern.quote(rootNorm), "")
        if (suffix.isEmpty) base else regexp_replace(base, "\\.unz$", "")
      }
      val groups =
        if (cfg.format == "json") Seq(headered.map(_._1))
        else headered.map { case (p, h) => (h, p) }
          .groupBy(_._1).values.map(_.map(_._2)).toSeq
      val frames = groups.map { members =>
        val full = members.map(p => s"$scanRoot/$p$suffix")
        val stored =
          if (cfg.format == "json")
            spark.read.json(full: _*).select(graft.model.Flatten.leafColumn(name), pathFromFile.as("__path"))
          else
            spark.read.option("header", "true").option("multiLine", "true").option("escape", "\"")
              .csv(full: _*).select(col(s"`$name`"), pathFromFile.as("__path"))
        val c0 = col("`" + stored.columns.head.replace("`", "``") + "`")
        stored.select(conv(c0).as("__time"), col("__path"))
      }
      Some(frames.reduce(_ unionByName _).distinct())
    }

    val withTime = source.filter(col("__time").isNotNull)
    def countMissing(missing: org.apache.spark.sql.DataFrame,
        into: scala.collection.mutable.Map[String, Long]): Unit = {
      // chunked fetch of the per-source-file verdicts (tiny agg rows)
      val it = missing.groupBy(col("__src")).count().toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val k = r.getString(0)
        into.update(k, into.getOrElse(k, 0L) + r.getLong(1))
      }
    }

    val counts = scala.collection.mutable.Map.empty[String, Long]
    try {
      val probedDf = probed.toDF("__p", "__header")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nExisting = graft.util.Timer.time("cleaner.cache")(probedDf.count())
        val chunkSize = math.max(1, cfg.mergeChunkBins)
        if (nExisting == 0L || timeField.isEmpty)
          countMissing(withTime, counts)
        else if (nExisting <= chunkSize) {
          // single pass covering every existing bin
          val chunk = probedDf.as[(String, String)].collect().toSeq
          targetTimesFor(chunk) match {
            case Some(t) => countMissing(withTime.join(t,
              Seq("__path", "__time"), "left_anti"), counts)
            case None => countMissing(withTime, counts)
          }
        } else {
          import scala.jdk.CollectionConverters._
          val nParts = math.max(1, math.ceil(nExisting.toDouble / chunkSize).toInt)
          val chunks = probedDf.repartition(nParts, col("__p"))
            .as[(String, String)].toLocalIterator().asScala.grouped(chunkSize)
          for (chunk <- chunks) {
            val chunkPaths = spark.createDataset(chunk.map(_._1)).toDF("__path")
            val withTimeChunk = withTime.join(broadcast(chunkPaths), Seq("__path"), "left_semi")
            targetTimesFor(chunk) match {
              case Some(t) => countMissing(withTimeChunk.join(t,
                Seq("__path", "__time"), "left_anti"), counts)
              case None => countMissing(withTimeChunk, counts)
            }
          }
          // records whose bin has no existing target at all: all missing
          countMissing(withTime.join(
            probedDf.select(col("__p").as("__path")), Seq("__path"), "left_anti"), counts)
        }
      } finally probedDf.unpersist(false)
    } finally {
      source.unpersist(false)
      // recursive: zip temps are whole unzip DIRECTORIES since round 11
      cleanupTemps.foreach(t =>
        new HPath(cfg.outputRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(t, true))
    }
    files.map(f => new HPath(f).getName).map(n => n -> counts.getOrElse(n, 0L)).toMap
  }
}
