package graft.jobs

import java.time.Instant

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ledger.OffsetRangeSet
import graft.util.Timer
import graft.model.Flatten
import graft.paths.PathTemplate
import graft.sources.{AvroRead, TopicFiles}
import graft.time.TimeExtract

/** The restructure job (§3.1 of SURVEY.md), Spark-shaped:
  *
  * driver: topic discovery → ledger filter → work list
  * cluster: avro scan → derive(time, path) → flatten → [dedup] →
  *          repartition(path) → one exactly-named file per bin
  *          (+ per-directory schema sidecars, written by the same tasks)
  * driver: ledger commit
  *
  * Output parity with the reference: flattened dot-named CSV headers,
  * JVM-rendered values, unpadded base64, `""` nulls, minimal quoting,
  * hourly UTC bins, `unknown-*` fallbacks, per-directory Avro schema
  * sidecar, keep-last dedup, offset-interval ledger for incremental
  * exactly-once re-runs (append-to-bin = merge-rewrite of existing file).
  */
object Restructure {

  /** Distributed bin-write report: bin COUNT plus a bounded, sorted path
    * sample (`maxReportedPaths` entries). The full per-bin path list was
    * the last O(bins) driver materialization — pure reporting, never
    * consumed by job logic — and a 10^7-bin run would hold ~1 GB of path
    * strings on the driver just for it. Runs writing fewer bins than the
    * cap still report every path (the sample IS the full sorted list).
    */
  final case class WrittenBins(count: Long, sample: Seq[String]) {
    def merge(o: WrittenBins, cap: Int): WrittenBins =
      WrittenBins(count + o.count, (sample ++ o.sample).sorted.take(cap))
    def isEmpty: Boolean = count == 0L
  }
  object WrittenBins { val empty: WrittenBins = WrittenBins(0L, Nil) }

  final case class TopicResult(topic: String, files: Seq[String], records: Long, bins: WrittenBins)
  final case class RunResult(processedTopics: Seq[TopicResult], ledger: OffsetRangeSet,
      failedTopics: Seq[(String, String)] = Nil)

  def run(spark: SparkSession, cfg: RestructureJobConfig,
      listing: Option[Map[String, Seq[org.apache.hadoop.fs.FileStatus]]] = None): RunResult = {
    val fs = new HPath(cfg.outputRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // local-FS checksum sidecars (.crc) are not part of the output contract
    fs.setWriteChecksum(false)
    fs.setVerifyChecksum(false)
    // ledger/lock backend: the Redis-protocol store when configured
    // (reference `redis:` deployments share state with an existing
    // install), the filesystem otherwise
    val store = cfg.ledgerStore()
    val ledger = store match {
      case Some(s) =>
        s.get(cfg.ledger).map(OffsetRangeSet.fromJson).getOrElse(new OffsetRangeSet)
      case None => loadLedger(fs, cfg.ledger)
    }
    migrateLegacyOffsets(fs, cfg, ledger, store)
    sweepStaleUnzipTemps(fs, cfg.outputRoot, cfg.staleTempAgeMs)
    val topics = listing.getOrElse(
      TopicFiles.listTopicsAll(spark, cfg.inputRoot +: cfg.extraInputRoots))
    val now = System.currentTimeMillis()

    // incremental accounting: the ledger is persisted after EVERY topic
    // commit (reference flushes offsets per write transaction,
    // OffsetRedisPersistence.kt:69-91), so a crash mid-run cannot re-extract
    // already-committed topics; the end-of-run flush remains as a safety net
    // multi-instance admission control (reference: per-topic Redis SET NX
    // lock, RedisRemoteLockManager.kt:18-44): a topic locked by another
    // replica is skipped this iteration; the ledger stays the correctness
    // mechanism either way
    val locks: Option[RemoteLocks] = store match {
      case Some(s) => Some(new StoreLocks(s, cfg.redisLockPrefix))
      case None => cfg.lockDir.map(d => new LockManager(fs, d))
    }
    // dedicated seconds-TTL manager for the flush lock (the hold is
    // millisecond-scale; a 24 h TTL would leave a crashed holder's peers
    // flushing merge-only-unlocked for a day before the stale-break)
    val flushLocks: Option[RemoteLocks] = flushLockManager(store, cfg, fs)

    val flushLock = new Object
    def flushLedger(): Unit =
      Timer.time("accounting.flush")(flushLock.synchronized {
        // Cross-topic lost-update guard (multi-instance only): per-topic
        // locks let two replicas processing DIFFERENT topics flush
        // concurrently, and a bare whole-document save would clobber the
        // peer's just-committed intervals (its files re-extract next run —
        // duplicate rows when dedup is off). Re-merge the persisted ledger
        // into ours before saving so every flush writes a superset of what
        // it read, and serialize the read-merge-write across replicas with
        // a dedicated ledger lock (a name containing '!' cannot collide
        // with a Kafka topic lock — topic names are [a-zA-Z0-9._-]). The
        // MERGE is the correctness mechanism; the lock only closes the
        // read-to-write window between peers, so if a peer starves us we
        // still merge-and-save — at worst the races of the unlocked scheme,
        // never worse.
        def mergeAndSave(): Unit = {
          store match {
            case Some(s) =>
              s.get(cfg.ledger).map(OffsetRangeSet.fromJson).foreach(ledger.mergeFrom)
              s.set(cfg.ledger, ledger.toJson)
            case None =>
              ledger.mergeFrom(loadLedgerAwaitVisible(fs, cfg.ledger))
              saveLedger(fs, cfg.ledger, ledger)
          }
        }
        flushLocks match {
          case Some(lm) =>
            var attempts = 0
            var done = lm.withLock(LedgerFlushLockName)(mergeAndSave()).isDefined
            while (!done && attempts < 40) {
              attempts += 1
              Thread.sleep(25)
              done = lm.withLock(LedgerFlushLockName)(mergeAndSave()).isDefined
            }
            if (!done) mergeAndSave()
          case None =>
            store.fold(saveLedger(fs, cfg.ledger, ledger))(_.set(cfg.ledger, ledger.toJson))
        }
      })

    // per-topic failure isolation (reference RadarKafkaRestructure.kt:100-103
    // "Failed to map topic", warn + continue): one corrupt file or bad
    // schema must not abort every other topic's extraction. The ledger only
    // commits per successful topic, so the failed topic re-extracts next run.
    val failedTopics = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    def processOne(topic: String, files: Seq[org.apache.hadoop.fs.FileStatus]): Option[TopicResult] =
      try locks match {
        case Some(lm) => lm.withLock(topic)(processUnlocked(topic, files)).flatten
        case None => processUnlocked(topic, files)
      } catch {
        case scala.util.control.NonFatal(e) =>
          Console.err.println(
            s"[graft] failed to process topic $topic: ${e.getClass.getSimpleName}: ${e.getMessage}")
          failedTopics.add(topic -> s"${e.getClass.getSimpleName}: ${e.getMessage}")
          None
      }

    def processUnlocked(topic: String, files: Seq[org.apache.hadoop.fs.FileStatus]): Option[TopicResult] = {
      val tCfg = cfg.topicConfig(topic)
      if (tCfg.exclude) None
      else {
        // Ledger freshness under the topic lock (multi-instance only):
        // another replica may have committed this topic between OUR ledger
        // load at run start and this lock acquisition — the lock orders
        // processing but not the snapshot, and filtering candidates
        // against the stale snapshot would re-extract the other replica's
        // files (the locks are advisory; THIS re-read is what makes the
        // ledger the correctness mechanism across instances). One
        // metadata-sized read per topic batch, paid whenever locks are
        // configured — which includes every store-backed deployment (the
        // reference's Redis deployments are inherently multi-replica, so a
        // peer may exist even when this process believes it is alone);
        // only lockless filesystem runs skip it.
        if (locks.nonEmpty) store match {
          case Some(s) =>
            s.get(cfg.ledger).map(OffsetRangeSet.fromJson).foreach(ledger.mergeFrom)
          case None => ledger.mergeFrom(loadLedgerAwaitVisible(fs, cfg.ledger))
        }
        // S7/P10/P13: unseen ∧ old-enough ∧ limit
        val candidates = files
          .map(st => (st, TopicFiles.parseFilename(st.getPath.getName)))
          .collect { case (st, Some(r)) => (st, r) }
          .filter { case (st, r) =>
            st.getLen > 0 &&
            (now - st.getModificationTime) >= cfg.minimumFileAgeMs &&
            !ledger.contains(r.topic, r.partition, r.from,
              r.to.getOrElse(r.from), Instant.ofEpochMilli(st.getModificationTime))
          }
        val limited = cfg.maxFilesPerTopic.fold(candidates)(candidates.take)
        if (limited.isEmpty) None
        else {
          // P10 record granularity: a partially-covered file (cleaner
          // rollback, reference-ledger migration, crash between topic
          // commits) re-extracts only its uncovered spans — covered
          // positions are skipped inside the Avro scan, whole blocks
          // without decoding
          val skip: Map[String, Seq[(Long, Long)]] = limited.flatMap { case (st, r) =>
            val cov = ledger.covered(r.topic, r.partition, r.from,
              r.to.getOrElse(Long.MaxValue - 1),
              Instant.ofEpochMilli(st.getModificationTime))
            if (cov.isEmpty) None
            else Some(st.getPath.getName ->
              cov.map { case (f, t) => (f - r.from, t - r.from) })
          }.toMap
          val r = processTopic(spark, cfg, fs, topic,
            limited.map(_._1.getPath.toString), ledger, skip)
          flushLedger()
          Some(r)
        }
      }
    }

    val topicSeq = topics.toSeq.sortBy(_._1)
    // per-topic fan-out (reference worker.numThreads): topics are
    // independent pipelines sharing the session's scheduler; the ledger is
    // synchronized internally
    val results =
      if (cfg.topicParallelism <= 1) topicSeq.flatMap { case (t, f) => processOne(t, f) }
      else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(cfg.topicParallelism)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try Await.result(
          Future.sequence(topicSeq.map { case (t, f) => Future(processOne(t, f)) }),
          Duration.Inf).flatten
        finally pool.shutdown()
      }
    flushLedger()
    store.foreach(_.close())
    import scala.jdk.CollectionConverters._
    RunResult(results, ledger, failedTopics.asScala.toSeq)
  }

  private def processTopic(
      spark: SparkSession, cfg: RestructureJobConfig, fs: FileSystem,
      topic: String, files: Seq[String], ledger: OffsetRangeSet,
      skip: Map[String, Seq[(Long, Long)]] = Map.empty): TopicResult = {
    val avroSchema = Timer.time("read")(AvroRead.topicReaderSchema(spark, files))
    // persist the decoded batch: the job reads it 3× (target-path listing,
    // open-ended offset counts, the bin write itself) and Avro decode is the
    // expensive step; the batch is bounded by maxFilesPerTopic
    val df = AvroRead.read(spark, files, Some(avroSchema), skip)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try processTopicImpl(spark, cfg, fs, topic, files, ledger, avroSchema, df, skip)
    finally df.unpersist(false)
  }

  private def processTopicImpl(
      spark: SparkSession, cfg: RestructureJobConfig, fs: FileSystem,
      topic: String, files: Seq[String], ledger: OffsetRangeSet,
      avroSchema: org.apache.avro.Schema, df: DataFrame,
      skip: Map[String, Seq[(Long, Long)]]): TopicResult = {
    val tCfg = cfg.topicConfig(topic)
    val dataSchema = StructType(df.schema.fields.filterNot(f =>
      f.name == AvroRead.FileCol || f.name == AvroRead.PosCol))

    val timeCol = TimeExtract.timeColumn(dataSchema)
    val template = tCfg.pathTemplate.getOrElse(cfg.pathTemplate)
    val params = PathTemplate.fixedParams(dataSchema, timeCol, lit(topic),
      cfg.extension, cfg.timeBinFormat)
    // G6: plugin enrichment (broadcast-joined dimension columns) happens
    // once per batch, before path compilation; the output projection selects
    // by dataSchema, so enrichment columns never reach the written files
    val dfE = cfg.pathPlugins.foldLeft(df)((d, p) => p.enrich(d))
    val basePath = PathTemplate.compile(template, params, Some(timeCol), Some(dataSchema),
      cfg.pathPlugins)
    // G8 bucket routing: a second template prefixes the output path
    val pathCol = cfg.bucketTemplate.fold(basePath)(bt =>
      concat(bucketWithFallback(cfg,
          PathTemplate.compile(bt, params, Some(timeCol), Some(dataSchema), cfg.pathPlugins)),
        lit("/"), basePath))

    val hasDynamic = Flatten.leafPaths(dataSchema).exists {
      case (_, _: MapType) | (_, _: ArrayType) => true
      case _ => false
    }
    // K4 schema sidecar rides the write tasks (BinWriter first-touch per
    // output directory, create-if-absent), along with the stale dot-temp
    // sweep — no driver-side pass over a collected bin-directory list
    val sidecarBytes = Some(avroSchema.toString(true).getBytes("UTF-8"))
    val written = Timer.time("close.store") {
      if (cfg.format == "json")
        writeJsonBins(spark, cfg, fs, topic, dfE, dataSchema, pathCol, tCfg, sidecarBytes)
      else if (hasDynamic)
        writeCsvBinsDynamic(spark, cfg, fs, topic, dfE, dataSchema, timeCol, template, tCfg,
          sidecarBytes)
      else writeCsvBins(spark, cfg, fs, topic, dfE, dataSchema, pathCol, tCfg, sidecarBytes)
    }

    // ledger commit: closed ranges are sized by their offset span; only
    // open-ended files (no end offset in the name) need a counting scan.
    // S9: an endOffset object tag closes an open range FIRST — tagged files
    // commit the tag's end offset with zero extra Spark jobs
    val tagSource = cfg.tagOffsetSource(fs.getConf)
    val parsed = files
      .flatMap { f =>
        val n = new HPath(f).getName
        TopicFiles.parseFilename(n).map { r =>
          val closed =
            if (r.to.isEmpty)
              tagSource.flatMap(_.endOffset(f)).fold(r)(e => r.copy(to = Some(e)))
            else r
          n -> closed
        }
      }
    val openEnded = parsed.collect { case (n, r) if r.to.isEmpty => n }
    val counts: Map[String, Long] =
      if (openEnded.isEmpty) Map.empty
      else {
        // chunked fetch: the per-file count rows stream partition-by-
        // partition (tiny post-shuffle agg), never one big collect buffer
        val it = df.filter(col(AvroRead.FileCol).isin(openEnded: _*))
          .groupBy(col(AvroRead.FileCol)).count().toLocalIterator()
        val b = Map.newBuilder[String, Long]
        while (it.hasNext) { val r = it.next(); b += r.getString(0) -> r.getLong(1) }
        b.result()
      }
    val processedAt = Instant.now()
    // skipped positions still count toward a file's total record count (the
    // open-ended end offset), but not toward records extracted this run
    val skippedPerFile: Map[String, Long] =
      skip.map { case (n, rs) => n -> rs.map { case (s, e) => e - s + 1 }.sum }
    Timer.time("accounting.add")(parsed.foreach { case (name, r) =>
      val to = r.to.getOrElse {
        val total = counts.getOrElse(name, 0L) + skippedPerFile.getOrElse(name, 0L)
        r.from + math.max(total, 1L) - 1
      }
      ledger.add(r.topic, r.partition, r.from, to, processedAt)
    })
    val records = parsed.map { case (name, r) =>
      val sk = skippedPerFile.getOrElse(name, 0L)
      r.to.map(t => t - r.from + 1 - sk).getOrElse(counts.getOrElse(name, 1L - math.min(sk, 1L)))
    }.sum
    TopicResult(topic, files, records, written)
  }

  /** Flattened CSV output projection: dot-named leaves in schema order,
    * binary → unpadded base64, NullType → string, excludeFields dropped,
    * everything cast to its CSV string form (so merge-with-existing unions
    * are type-aligned).
    */
  private def csvColumns(dataSchema: StructType, exclude: Set[String]): Seq[Column] =
    Flatten.leafPaths(dataSchema)
      .filterNot { case (n, _) => exclude(n) }
      .map { case (n, dt) =>
        val c = Flatten.leafColumn(n)
        val rendered = dt match {
          case BinaryType => regexp_replace(base64(c), "=+$", "") // P5 unpadded
          case NullType => lit(null).cast(StringType)
          case _ => c.cast(StringType) // JVM toString parity incl. doubles
        }
        rendered.as(n)
      }

  private[graft] def writeCsvBins(
      spark: SparkSession, cfg: RestructureJobConfig, fs: FileSystem, topic: String,
      df: DataFrame, dataSchema: StructType, pathCol: Column, tCfg: TopicJobConfig,
      sidecar: Option[Array[Byte]] = None): WrittenBins = {
    val outCols = csvColumns(dataSchema, cfg.allExcludeFields(topic))
    val prepared = df.select(outCols ++ Seq(
      pathCol.as("__path"), col(AvroRead.FileCol), col(AvroRead.PosCol)): _*)
    mergeCommitBins(spark, cfg, fs, prepared, "csv", None, topic, sidecar)
  }

  /** K2 append-to-existing: union the current contents of every bin this
    * batch touches (existing rows sort before any new file and participate
    * in dedup, FileCache.kt:147-179). K9: an unreadable target (corrupt
    * gzip/zip) is quarantined as `<name>.corrupted[-i]` and the bin starts
    * fresh (FileCache.kt:205-235).
    *
    * Merge PLANNING is distributed AND its consumption CHUNKED: existence +
    * readability + header probing runs as one Spark job over the distinct
    * bin paths (one FS metadata call per bin rides the executors, not a
    * driver thread pool), and the probe result is consumed on the driver in
    * chunks of at most `cfg.mergeChunkBins` paths — each chunk's
    * header-group readers are planned and COMMITTED before the next chunk
    * is fetched, so a re-run touching 10^7 pre-existing bins never holds
    * more than one chunk of path strings (plus one probe shuffle
    * partition) on the driver. A cold run short-circuits on the probe
    * count and fetches nothing. Per-chunk commits are safe because chunks
    * PARTITION the bin space: every bin's rows (existing + new) land
    * wholly in exactly one commit, the writer's dedup is per bin, and the
    * ledger marks source files only after the whole topic batch succeeds —
    * a crash mid-chunks re-runs the batch idempotently under the
    * reference's append contract (existing rows participate in dedup).
    *
    * `jsonSchema` is Some(nested schema) for JSON bins (read typed, no
    * inference); None for CSV bins (read as strings by each file's header).
    *
    * Column-union nuance: a commit renders every bin with the UNION of its
    * frame's columns (new schema + all merged headers in that commit).
    * Headers are uniform in the static path (one schema per topic batch;
    * the dynamic path isolates differing headers into attempt files
    * upstream), so chunked and single commits agree. If existing bins
    * carry DRIFTED extra columns, a chunked run unions per chunk rather
    * than across the whole batch — each bin still keeps its own columns
    * plus the batch schema, which is the semantically meaningful set.
    */
  private[jobs] def mergeCommitBins(
      spark: SparkSession, cfg: RestructureJobConfig, fs: FileSystem,
      prepared: DataFrame, format: String, jsonSchema: Option[StructType],
      topic: String, sidecar: Option[Array[Byte]]): WrittenBins = {
    import spark.implicits._
    val confEntries = AvroRead.fsConfEntries(spark)
    val outputRoot = cfg.outputRoot
    // probe state: 0 = exists (zip mode: no header needed), 1 = readable
    // with header, 2 = exists but unreadable/corrupt
    val wantHeader = !cfg.zip
    val fmt = format
    val probed = prepared.select(col("__path")).distinct().as[String].mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val conf = new org.apache.hadoop.conf.Configuration()
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val pfs = new HPath(outputRoot).getFileSystem(conf)
        it.flatMap { p =>
          val full = new HPath(s"$outputRoot/$p")
          if (!pfs.exists(full)) None
          else if (!wantHeader) Some((p, 0, ""))
          else if (!sniffReadable(pfs, full.toString)) Some((p, 2, ""))
          else if (fmt == "json") Some((p, 1, ""))
          else readHeaderLine(pfs, full) match {
            case Some(h) => Some((p, 1, h))
            case None => Some((p, 2, ""))
          }
        }
      }
    }
    val probedDf = probed.toDF("__p", "__state", "__header")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nExisting = Timer.time("write.open")(probedDf.count())
      val chunkSize = math.max(1, cfg.mergeChunkBins)
      if (nExisting == 0L)
        commitBins(spark, cfg, fs, prepared, format, topic, sidecar)
      else if (nExisting <= chunkSize) {
        // common append case: one chunk covering every existing bin —
        // the exact single-commit plan shape of a non-chunked merge
        val chunk = probedDf.as[(String, Int, String)].collect().toSeq
        val temps = scala.collection.mutable.ArrayBuffer.empty[HPath]
        try commitBins(spark, cfg, fs,
          mergeChunk(spark, cfg, fs, prepared, chunk, fmt, jsonSchema, temps),
          format, topic, sidecar)
        finally temps.foreach(t => fs.delete(t, true))
      } else {
        // giant re-run: fetch ≤chunkSize probe rows at a time (cached
        // partitions sized ~chunkSize, so toLocalIterator holds one);
        // each chunk re-scans the persisted batch for its bins' rows —
        // N-chunk re-runs trade N cached scans for O(chunk) driver heap.
        // Cleaner.verifyTopic mirrors this loop — change both in lockstep.
        import scala.jdk.CollectionConverters._
        val nParts = math.max(1, math.ceil(nExisting.toDouble / chunkSize).toInt)
        var written = WrittenBins.empty
        val chunks = probedDf.repartition(nParts, col("__p"))
          .as[(String, Int, String)].toLocalIterator().asScala.grouped(chunkSize)
        for (chunk <- chunks) {
          val chunkPaths = spark.createDataset(chunk.map(_._1)).toDF("__path")
          val preparedChunk =
            prepared.join(broadcast(chunkPaths), Seq("__path"), "left_semi")
          val temps = scala.collection.mutable.ArrayBuffer.empty[HPath]
          try written = written.merge(commitBins(spark, cfg, fs,
            mergeChunk(spark, cfg, fs, preparedChunk, chunk, fmt, jsonSchema, temps),
            format, topic, sidecar), cfg.maxReportedPaths)
          finally temps.foreach(t => fs.delete(t, true))
        }
        // bins with no existing target: one final new-only commit
        val newOnly = prepared.join(
          probedDf.select(col("__p").as("__path")), Seq("__path"), "left_anti")
        written.merge(
          commitBins(spark, cfg, fs, newOnly, format, topic, sidecar),
          cfg.maxReportedPaths)
      }
    } finally probedDf.unpersist(false)
  }

  /** One chunk's merge plan: quarantine corrupt targets, then union the
    * chunk's new rows with ONE reader per distinct header (CSV) / one
    * overall (JSON) — O(attempt-schemas) plan nodes per chunk, not
    * O(bins); each reader carries the known relative bin path as `__path`
    * so all bins of a group load in a single distributed scan.
    *
    * Zip bins (which Spark's readers cannot decompress) are streamed into
    * ONE temp directory on the output filesystem, mirroring their relative
    * paths with an `.unz` suffix — the same per-header single scans then
    * apply, with `__path` re-derived by stripping the temp prefix/suffix.
    * Plan node count is O(headers) for zip too (previously one union
    * branch PER zip bin). A zip that fails to stream (corrupt/empty) is
    * quarantined and its bin starts fresh. `temps` receives the temp
    * directory for post-commit recursive cleanup.
    */
  private[jobs] def mergeChunk(
      spark: SparkSession, cfg: RestructureJobConfig, fs: FileSystem,
      preparedChunk: DataFrame, chunk: Seq[(String, Int, String)],
      format: String, jsonSchema: Option[StructType],
      temps: scala.collection.mutable.Buffer[HPath]): DataFrame = {
    chunk.collect { case (p, 2, _) => p }
      .foreach(p => quarantine(fs, new HPath(s"${cfg.outputRoot}/$p")))
    val headered = chunk.collect { case (p, s, h) if s != 2 => (p, h) }
    val (frames, failed) = existingBinFrames(spark, fs, cfg.outputRoot,
      headered, format, jsonSchema, cfg.zip, temps)
    failed.foreach(p => quarantine(fs, new HPath(s"${cfg.outputRoot}/$p")))
    // Drifted-column visibility: a bin is rewritten with the column UNION
    // of its chunk's frame, so when existing bins carry columns the batch
    // schema lacks, the rewritten header depends on hash-based chunk
    // assignment — the same store can get different headers run to run.
    // Surface it instead of staying silent (the doc comment on
    // mergeCommitBins explains why the per-chunk union is still the
    // semantically meaningful set).
    val driftedCols = frames.iterator.flatMap(_.columns).toSet -
      "__path" -- preparedChunk.columns
    if (driftedCols.nonEmpty)
      Console.err.println(
        s"[graft] existing bins carry ${driftedCols.size} column(s) absent from the " +
          s"batch schema (${driftedCols.toSeq.sorted.take(8).mkString(", ")}" +
          s"${if (driftedCols.size > 8) ", …" else ""}); rewritten headers will union " +
          "per merge chunk, so header column sets may vary run to run on this store")
    frames.foldLeft(preparedChunk) { (acc, stored) =>
      val old = stored
        .withColumn(AvroRead.FileCol, lit("")) // sorts before any real file
        .withColumn(AvroRead.PosCol, monotonically_increasing_id())
      acc.unionByName(old, allowMissingColumns = true)
    }
  }

  /** Readers over a chunk's EXISTING bins — the ONE place the scanned-row
    * → bin-path mapping is defined (shared by [[mergeChunk]] and
    * [[Cleaner.verifyTopic]], which previously each built it): one
    * DataFrame per distinct CSV header (one overall for JSON), each
    * carrying the known relative bin path as its `__path` column. Zip
    * bins stream into one dot-prefixed temp directory first (appended to
    * `temps` for recursive post-use cleanup), with each bin's real header
    * read off the unzipped file. Returns (frames, failed): `failed` = zip
    * bins that would not stream or had no readable header — the caller
    * decides what that means (restructure quarantines, the cleaner keeps
    * the source file). `headered` must already exclude corrupt probe
    * entries.
    */
  private[jobs] def existingBinFrames(
      spark: SparkSession, fs: FileSystem, outputRoot: String,
      headered: Seq[(String, String)], format: String,
      jsonSchema: Option[StructType], zip: Boolean,
      temps: scala.collection.mutable.Buffer[HPath])
      : (Seq[DataFrame], Seq[String]) = {
    val (scanRoot, suffix, avail, failed) =
      if (!zip) (outputRoot, "", headered, Nil)
      else {
        val tempRoot = s"$outputRoot/.graft-unzip-${java.util.UUID.randomUUID()}"
        temps += new HPath(tempRoot)
        val unz = unzipBins(fs, outputRoot, tempRoot, headered.map(_._1),
          wantHeader = format != "json")
        (tempRoot, ".unz",
          unz.collect { case (p, Some(h)) => (p, h) },
          unz.collect { case (p, None) => p })
      }
    val frames =
      if (format == "json") {
        // JSON bins ride [[readJsonBinFiles]] — the same distributed
        // whole-file recipe as the CSV branch below — instead of
        // spark.read.json's per-file DataFrame-source setup (~28 ms/file;
        // the round-17 residual). The known relative path doubles as
        // `__path` directly, which also retires the input_file_name
        // percent-decode UDF this branch used to need (bin paths carrying
        // URI-escapable characters never pass through an encoded URI now).
        // jsonSchema is always Some on this path (writeJsonBins passes the
        // typed data schema); the inference fallback survives only for a
        // hypothetical schemaless caller.
        Seq(avail.map(_._1)).filter(_.nonEmpty).map { members =>
          val sch = jsonSchema.getOrElse(
            // schemaless caller (none exists today): one inference pass,
            // then the same bespoke read
            spark.read.json(members.map(p => s"$scanRoot/$p$suffix"): _*).schema)
          readJsonBinFiles(spark, scanRoot, suffix, members, sch)
        }
      } else {
        // CSV bins go through [[readCsvBinFiles]] — a distributed
        // whole-file Univocity read — instead of spark.read.csv: the
        // DataFrame CSV source pays ~28 ms of per-file setup, which at a
        // 20k-tiny-bin append is >20 s of pure overhead per merge chunk
        // against ~0.1 s of raw IO (PLANS.md round-17 attribution); the
        // reference-scale 50k-bin store would spend the append in reader
        // setup. __path is the known relative path directly.
        avail.groupBy(_._2).toSeq.map { case (h, members) =>
          readCsvBinFiles(spark, scanRoot, suffix, members.map(_._1), h)
        }
      }
    (frames, failed)
  }

  /** Default bounded open-ahead depth for the bespoke bin readers. */
  private[graft] val BinOpenAheadDefault = 4

  /** Bounded open-AHEAD over one task's bin files: on an object store every
    * open is a ~20-50 ms GET round-trip, and a task opening hundreds of
    * bins sequentially rebuilds a seconds-scale wall at 50k bins (the
    * round-17 watch item — at S3-class ~30 ms/GET, 50k bins across 64
    * slices is ~23 s of pure open latency). Up to `ahead` opens run on a
    * small background pool, overlapping the current file's parse; memory
    * stays bounded (at most `ahead` OPEN streams ahead, no buffered bytes).
    * The returned iterator yields (relPath, rawStream) with the stream the
    * CONSUMER's to close; streams still in flight when the task completes
    * (success, failure, or partial consumption) are closed by a
    * task-completion listener. `ahead <= 0` degrades to plain sequential
    * opens (the bench's A/B baseline).
    */
  private def openBinsAhead(pfs: FileSystem, root: String, sfx: String,
      paths: Array[String], ahead: Int): Iterator[(String, java.io.InputStream)] = {
    def openOne(p: String): java.io.InputStream = pfs.open(new HPath(s"$root/$p$sfx"))
    if (ahead <= 0 || paths.length <= 1)
      return paths.iterator.map(p => (p, openOne(p)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(ahead, 4), (r: Runnable) => {
        val t = new Thread(r, "graft-bin-open-ahead"); t.setDaemon(true); t
      })
    val futures = new Array[java.util.concurrent.Future[java.io.InputStream]](paths.length)
    var submitted = 0
    def submitUpTo(limit: Int): Unit =
      while (submitted < math.min(limit, paths.length)) {
        val p = paths(submitted)
        futures(submitted) = pool.submit(
          new java.util.concurrent.Callable[java.io.InputStream] {
            def call(): java.io.InputStream = openOne(p)
          })
        submitted += 1
      }
    @volatile var cursor = 0
    val cleaned = new java.util.concurrent.atomic.AtomicBoolean(false)
    def cleanup(): Unit = if (cleaned.compareAndSet(false, true)) {
      (cursor until submitted).foreach { i =>
        try {
          val f = futures(i)
          if (f != null) { f.cancel(false); if (!f.isCancelled) f.get().close() }
        } catch { case _: Exception => }
      }
      pool.shutdownNow()
    }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => cleanup()))
    new Iterator[(String, java.io.InputStream)] {
      def hasNext: Boolean = { val h = cursor < paths.length; if (!h) cleanup(); h }
      def next(): (String, java.io.InputStream) = {
        val i = cursor
        submitUpTo(i + 1 + ahead)
        // advance BEFORE the blocking get: if the open failed, its slot
        // holds no stream, and cleanup starts from the next in-flight one
        cursor = i + 1
        (paths(i), futures(i).get())
      }
    }
  }

  /** Distributed whole-file CSV read of EXISTING bins (the merge/cleaner
    * re-read path): each task opens its files directly and parses them with
    * the same Univocity parser Spark's CSV source uses, configured to match
    * this codebase's reader options — header row, quote `"` escaped by
    * doubling, multiLine (embedded newlines inside quotes), permissive
    * ragged-row handling, empty-and-missing → null (what spark.read.csv
    * yields for string columns). Whole-file parse bounds task memory by the
    * largest single bin, exactly like the multiLine=true source it
    * replaces. Row-for-row parity with spark.read.csv is pinned by
    * `CsvReadParitySpec` over adversarial content (quoted newlines, doubled
    * quotes, empty vs missing fields, unicode, CRLF, ragged rows) and by
    * the merge/quarantine golden e2es.
    */
  private[graft] def readCsvBinFiles(spark: SparkSession, scanRoot: String,
      suffix: String, members: Seq[String], headerLine: String,
      openAhead: Int = BinOpenAheadDefault): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField}
    def settings(): com.univocity.parsers.csv.CsvParserSettings = {
      val s = new com.univocity.parsers.csv.CsvParserSettings
      val fmt = s.getFormat
      fmt.setDelimiter(',')
      fmt.setQuote('"')
      fmt.setQuoteEscape('"')
      fmt.setCharToEscapeQuoteEscaping('\u0000')
      fmt.setComment('\u0000')
      s.setIgnoreLeadingWhitespaces(false)
      s.setIgnoreTrailingWhitespaces(false)
      s.setReadInputOnSeparateThread(false)
      s.setMaxCharsPerColumn(-1)
      s.setMaxColumns(20480)
      s.setNullValue("")
      s.setEmptyValue("")
      s.setUnescapedQuoteHandling(
        com.univocity.parsers.csv.UnescapedQuoteHandling.STOP_AT_DELIMITER)
      s.setLineSeparatorDetectionEnabled(true)
      s
    }
    val parsedHeader = new com.univocity.parsers.csv.CsvParser(settings()).parseLine(headerLine)
    // makeSafeHeader parity with spark.read.csv (CSVDataSource, default
    // case-INsensitive analysis): empty/null names become _c<i>; names
    // duplicated (case-insensitively) get their column index appended —
    // without this, a bin whose flattened header repeats a name would
    // yield a duplicate-column DataFrame that fails later in unionByName
    // with an ambiguous-column error instead of merging.
    val dupNames = parsedHeader.iterator.filter(c => c != null && c.nonEmpty)
      .map(_.toLowerCase(java.util.Locale.ROOT))
      .toSeq.groupBy(identity).filter(_._2.size > 1).keySet
    val cols = parsedHeader.zipWithIndex.map { case (c, i) =>
      if (c == null || c.isEmpty) s"_c$i"
      else if (dupNames.contains(c.toLowerCase(java.util.Locale.ROOT))) s"$c$i"
      else c
    }
    val n = cols.length
    val confEntries = AvroRead.fsConfEntries(spark)
    val slices = math.max(1,
      math.min(members.size, spark.sparkContext.defaultParallelism * 2))
    val rootLocal = scanRoot
    val sfx = suffix
    val aheadLocal = openAhead
    val rdd = spark.sparkContext.parallelize(members, slices).mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      confEntries.foreach { case (k, v) => conf.set(k, v) }
      val pfs = new HPath(rootLocal).getFileSystem(conf)
      val parser = new com.univocity.parsers.csv.CsvParser(settings())
      openBinsAhead(pfs, rootLocal, sfx, it.toArray, aheadLocal).flatMap { case (p, raw) =>
        // a corrupt/truncated gzip header throws from the decompressor
        // CONSTRUCTOR — close the raw FS stream on that path too (the
        // finally below only covers streams that reached the reader)
        val in: java.io.InputStream =
          if (p.endsWith(".gz"))
            try new java.util.zip.GZIPInputStream(raw)
            catch { case e: Throwable => raw.close(); throw e }
          else raw
        val reader = new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8)
        val parsed = try parser.parseAll(reader) finally reader.close()
        import scala.jdk.CollectionConverters._
        // first row is the header; short rows pad with null, long rows
        // truncate — PERMISSIVE's partial-row behavior for our all-string
        // schema. "" → null matches spark.read.csv's nullValue default.
        parsed.asScala.iterator.drop(1).map { toks =>
          val vals = new Array[Any](n + 1)
          var i = 0
          while (i < n) {
            val v = if (toks != null && i < toks.length) toks(i) else null
            vals(i) = if (v == null || v.isEmpty) null else v
            i += 1
          }
          vals(n) = p
          org.apache.spark.sql.Row.fromSeq(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        }
      }
    }
    val schema = StructType(
      cols.map(c => StructField(c, StringType, nullable = true)).toSeq :+
        StructField("__path", StringType, nullable = false))
    spark.createDataFrame(rdd, schema)
  }

  /** Distributed whole-file JSON-lines read of EXISTING bins — the JSON
    * twin of [[readCsvBinFiles]], killing the same ~28 ms/file
    * DataFrame-source setup `spark.read.json` pays per existing bin (the
    * round-17 documented residual; at a 20k-bin JSON append that constant
    * was the whole wall). Each task opens its files directly, splits them
    * into lines (JSON-lines bins never embed raw newlines — the writer
    * escapes them), and the known TYPED schema is applied by
    * `from_json` — Catalyst's own Jackson parser, i.e. the exact parser
    * and coercion rules `spark.read.json` uses, so typed parity is by
    * construction (pinned adversarially in `JsonReadParitySpec`).
    * Whitespace-only lines are skipped like the DataFrame source does;
    * a malformed line yields the same all-null PERMISSIVE row. `__path`
    * is the known relative path directly — no input_file_name decode.
    */
  private[jobs] def readJsonBinFiles(spark: SparkSession, scanRoot: String,
      suffix: String, members: Seq[String], schema: StructType,
      openAhead: Int = BinOpenAheadDefault): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField}
    val confEntries = AvroRead.fsConfEntries(spark)
    val slices = math.max(1,
      math.min(members.size, spark.sparkContext.defaultParallelism * 2))
    val rootLocal = scanRoot
    val sfx = suffix
    val aheadLocal = openAhead
    val rdd = spark.sparkContext.parallelize(members, slices).mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      confEntries.foreach { case (k, v) => conf.set(k, v) }
      val pfs = new HPath(rootLocal).getFileSystem(conf)
      openBinsAhead(pfs, rootLocal, sfx, it.toArray, aheadLocal).flatMap { case (p, raw) =>
        val in: java.io.InputStream =
          if (p.endsWith(".gz"))
            try new java.util.zip.GZIPInputStream(raw)
            catch { case e: Throwable => raw.close(); throw e }
          else raw
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8), 65536)
        // eager whole-file read: deterministic close, task memory bounded
        // by the largest single bin — same contract as the CSV twin
        val lines = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        try {
          var l = reader.readLine()
          while (l != null) {
            if (!l.forall(Character.isWhitespace)) lines += org.apache.spark.sql.Row(l, p)
            l = reader.readLine()
          }
        } finally reader.close()
        lines.iterator
      }
    }
    val lineDf = spark.createDataFrame(rdd, StructType(Seq(
      StructField("__line", StringType, nullable = false),
      StructField("__path", StringType, nullable = false))))
    lineDf
      .select(from_json(col("__line"), schema).as("__r"), col("__path"))
      .select(col("__r.*"), col("__path"))
  }

  /** Stream a set of existing zip bins into `tempRoot`, mirroring their
    * relative paths with an `.unz` suffix so the bin readers map back by
    * prefix/suffix strip. Returns one entry per input: `Some(header)`
    * (the first line when `wantHeader`, else "") on success, `None` when
    * the zip fails to stream or its header is unreadable — the CALLER
    * decides what a failure means (restructure quarantines, the cleaner
    * keeps the source file). Shared by [[mergeChunk]] and
    * [[Cleaner.verifyTopic]].
    */
  private[jobs] def unzipBins(fs: FileSystem, outputRoot: String, tempRoot: String,
      rels: Seq[String], wantHeader: Boolean): Seq[(String, Option[String])] =
    rels.map { p =>
      try {
        val tmp = new HPath(s"$tempRoot/$p.unz")
        val zin = new java.util.zip.ZipInputStream(fs.open(new HPath(s"$outputRoot/$p")))
        val out = fs.create(tmp, true)
        try {
          require(zin.getNextEntry != null, s"empty zip: $p")
          val buf = new Array[Byte](65536)
          var n = zin.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
        } finally { zin.close(); out.close() }
        (p, if (wantHeader) readHeaderLine(fs, tmp) else Some(""))
      } catch { case _: Exception => (p, None) }
    }

  /** Driver-side readability probe: stream the first bytes through the
    * matching decompressor. Catches truncated/corrupt gzip and zip targets
    * without launching a Spark job per bin.
    */
  private def sniffReadable(fs: FileSystem, path: String): Boolean =
    try {
      val raw = fs.open(new HPath(path))
      val in =
        if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw)
        else if (path.endsWith(".zip")) {
          val z = new java.util.zip.ZipInputStream(raw)
          if (z.getNextEntry == null) throw new java.io.IOException("empty zip")
          z
        } else raw
      try { in.read(new Array[Byte](1024)); true } finally in.close()
    } catch { case _: Exception => false }

  /** §7.4-1 data-dependent CSV schemas: map keys and array indices become
    * columns per record, RECURSIVELY — `array<record>` flattens to
    * `a.0.b, a.1.b…`, `map<string,record>` to `m.key.b…`, to any depth
    * (CsvAvroDataConverter.kt:52-63 recurses through RECORD/MAP/ARRAY
    * alike); records whose flattened header differs (different key sets /
    * arity at any depth) go to attempt files `bin_1.csv`, `bin_2.csv`, …
    * (RestructureWorker.kt:163-183).
    *
    * Spark shape: one pass computes a per-record canonical SHAPE string
    * ([[graft.model.DynamicShape]]) whose md5 is the header fingerprint;
    * attempt numbers are assigned by first appearance (file, pos) of each
    * fingerprint within the topic batch; each fingerprint group is written
    * with ITS OWN recursively-expanded header, derived by parsing the
    * group's (uniform) shape string back into a tree.
    */
  private[graft] def writeCsvBinsDynamic(
      spark: SparkSession, cfg: RestructureJobConfig, fs: FileSystem, topic: String,
      df: DataFrame, dataSchema: StructType, timeCol: Column, template: String,
      tCfg: TopicJobConfig, sidecar: Option[Array[Byte]] = None): WrittenBins = {
    import graft.model.DynamicShape
    // persisted once: the fingerprint groups' headers come from ONE
    // aggregation over this frame, and each group's write re-reads it from
    // cache — job count and scan count stay independent of group count
    // (previously: one agg job + one full source re-scan PER group)
    val withFp = df
      .withColumn("__shape", DynamicShape.rootShapeCol(dataSchema))
      .withColumn("__fp", md5(col("__shape").cast(BinaryType)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // one pass: per-fingerprint first appearance (attempt order — reference:
    // arrival order) AND the group's concrete shape (uniform within the
    // group by construction — any row's value serves)
    // limit(cap+1) BEFORE the collect: the cap check below must fire from a
    // bounded driver materialization. A pathological batch (per-row-unique
    // map keys → millions of distinct shapes, each carrying its full shape
    // string) would otherwise materialize the whole group table on the
    // driver just to throw the capped error — OOM instead of the designed
    // fail-with-cure. orderBy before limit keeps attempt order intact for
    // the ≤cap case that proceeds.
    val groupRows = withFp
      .groupBy(col("__fp"))
      .agg(min(struct(col(AvroRead.FileCol), col(AvroRead.PosCol))).as("__first"),
        first(col("__shape")).as("__gshape"))
      .orderBy(col("__first"))
      .limit(cfg.maxSchemaFingerprints + 1)
      .collect()
    try {
      // enforced bound on the per-group pass: each header shape filters the
      // CACHED frame once (the source is scanned once, into the persist
      // above), so total work grows linearly with shape count — fine for
      // the schema-drift topics this serves (a handful of shapes),
      // pathological beyond it. Fail with a cure instead of grinding
      // through thousands of cache passes. INSIDE the try: per-topic
      // failure isolation keeps the run alive after this throw, so the
      // finally must still release the cached batch.
      require(groupRows.length <= cfg.maxSchemaFingerprints,
        s"topic $topic has more than ${cfg.maxSchemaFingerprints} distinct map-key/array-arity " +
          s"header shapes in one batch (cap ${cfg.maxSchemaFingerprints}); each shape writes its own header " +
          "in its own pass over the cached batch. Fix the producer schema drift, raise " +
          "worker.maxSchemaFingerprints, or process in smaller batches " +
          "(worker.maxFilesPerTopic) so fewer shapes land per run")
      groupRows.toSeq.map { row =>
      val fp = row.getString(row.fieldIndex("__fp"))
      val group = withFp.filter(col("__fp") === fp).drop("__fp", "__shape")
      val exclude = cfg.allExcludeFields(topic)
      // excludeFields match FLATTENED names, so map-key / array-index
      // expansions filter on their expanded form too (reference golden:
      // excludeFields {a, i.other} drops the i.other map column,
      // CsvAvroConverterTest.kt:69-84)
      val shapes = DynamicShape.parseRoot(
        row.getString(row.fieldIndex("__gshape")), dataSchema)
      val outCols = DynamicShape.expandRoot(dataSchema, shapes, exclude)
      // attempt resolution consults EXISTING target headers (reference
      // semantics: arrival order against existing files,
      // RestructureWorker.kt:163-183): a bin whose file already holds this
      // group's header reuses that attempt; otherwise the first free slot.
      // Groups commit sequentially, so earlier groups' files are visible.
      // the stored header is written by Spark's CSV writer, which quotes
      // fields containing delimiter/quote/newline (map keys can hold any of
      // these) — apply the same quoting before comparing
      val header = outCols.map(c => csvQuote(dataColName(c))).mkString(",")
      val params = PathTemplate.fixedParams(dataSchema, timeCol, lit(topic),
        cfg.extension, cfg.timeBinFormat)
      val plainPathCol = PathTemplate.compile(template, params, Some(timeCol), Some(dataSchema),
        cfg.pathPlugins)
      // G8 bucket routing applies to dynamic topics exactly as to static ones
      val basePathCol = cfg.bucketTemplate.fold(plainPathCol)(bt =>
        concat(bucketWithFallback(cfg,
            PathTemplate.compile(bt, params, Some(timeCol), Some(dataSchema), cfg.pathPlugins)),
          lit("/"), plainPathCol))
      val withBase = group.select(outCols ++ Seq(
        basePathCol.as("__base"), col(AvroRead.FileCol), col(AvroRead.PosCol)): _*)
      // attempt slots resolve EXECUTOR-side (one exists/header probe chain
      // per distinct base path, distributed like the merge planning above).
      // Groups still commit sequentially, so earlier groups' files are
      // visible to later groups' probes.
      val confEntries = AvroRead.fsConfEntries(spark)
      val outputRoot = cfg.outputRoot
      val ext = cfg.extension
      val hdr = header
      import spark.implicits._
      // the probing itself is distributed, but the RESULT is materialized
      // exactly once: mapDf is FS-state-dependent (exists/header probes),
      // and its two consumers (mergeCommitBins' planning job and the
      // commit join) must see one FS snapshot — a lazy plan re-evaluated
      // per action could assign diverging attempt slots if quarantine
      // renames happen in between, routing rows to a bin never probed for
      // merging. The mapping is one row per bin this group touches, the
      // same cardinality the broadcast join holds on the driver anyway.
      val attemptPairs = withBase.select(col("__base")).distinct().as[String].mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val conf = new org.apache.hadoop.conf.Configuration()
          confEntries.foreach { case (k, v) => conf.set(k, v) }
          val pfs = new HPath(outputRoot).getFileSystem(conf)
          it.map(bp => (bp, resolveAttemptPath(pfs, outputRoot, ext, bp, hdr)))
        }
      }.collect()
      val mapDf = spark.createDataset(attemptPairs.toSeq).toDF("__base", "__path")
      val prepared = withBase.join(broadcast(mapDf), "__base").drop("__base")
      mergeCommitBins(spark, cfg, fs, prepared, "csv", None, topic, sidecar)
      }.foldLeft(WrittenBins.empty)(_.merge(_, cfg.maxReportedPaths))
    } finally withFp.unpersist(false)
  }

  /** RFC4180 quoting as Spark's CSV writer applies it: quote only when the
    * field contains delimiter/quote/CR/LF; embedded quotes double.
    */
  private[jobs] def csvQuote(field: String): String =
    if (field.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + field.replace("\"", "\"\"") + "\""
    else field

  /** Bucket-name safety net (reference FormattedPathFactory.kt:51-60):
    * a formatted bucket name FULL-matching any `bucketDisabledFormats`
    * regex — case-insensitively, per Kotlin's
    * `toRegex(IGNORE_CASE).matches()` — is replaced by
    * `bucketDefaultName`. A plain `when/rlike` column expression, so the
    * substitution rides inside the same codegen'd path projection as the
    * template itself (no extra pass, nothing driver-side).
    */
  private def bucketWithFallback(cfg: RestructureJobConfig, bucket: Column): Column =
    if (cfg.bucketDisabledFormats.isEmpty) bucket
    else {
      // anchor for full-match and wrap each user regex non-capturing so
      // alternation cannot leak across patterns
      val pattern = cfg.bucketDisabledFormats.mkString("(?i)^(?:(?:", ")|(?:", "))$")
      when(bucket.rlike(pattern), lit(cfg.bucketDefaultName)).otherwise(bucket)
    }

  private def dataColName(c: Column): String = {
    // alias name of a projection column built with .as(name)
    val s = c.toString
    val i = s.lastIndexOf(" AS ")
    (if (i >= 0) s.substring(i + 4) else s).stripPrefix("`").stripSuffix("`")
  }

  /** First free or header-matching attempt slot for `basePath`
    * (`bin.csv`, `bin_1.csv`, `bin_2.csv`, …). Runs executor-side (static
    * call, primitive args) so attempt planning distributes with the paths.
    */
  private[jobs] def resolveAttemptPath(
      fs: FileSystem, outputRoot: String, extension: String,
      basePath: String, header: String): String = {
    def withAttempt(i: Int): String =
      if (i == 0) basePath
      else if (basePath.endsWith(extension))
        basePath.dropRight(extension.length) + s"_$i" + extension
      else basePath + s"_$i"
    var i = 0
    while (i < 1000) {
      val cand = withAttempt(i)
      val full = new HPath(s"$outputRoot/$cand")
      if (!fs.exists(full)) return cand
      if (readHeaderLine(fs, full).contains(header)) return cand
      i += 1
    }
    withAttempt(i)
  }

  /** First header RECORD of a (possibly gzip/zip) CSV bin, or None if
    * unreadable. Two traps a naive first-line read falls into, both real
    * for dynamic map-key headers: (1) bytes must decode as UTF-8 (reading
    * byte-as-char mojibakes a `é`/`中` column name, so the attempt-reuse
    * comparison against the rendered header never matches and every
    * append leaks a new `_N` attempt file); (2) a quoted column name may
    * contain an embedded newline, so the record ends at the first UNQUOTED
    * `\n` — RFC4180 quote-toggle scan, doubled quotes toggle out and back.
    */
  private[jobs] def readHeaderLine(fs: FileSystem, path: HPath): Option[String] =
    try {
      val raw = fs.open(path)
      val in =
        if (path.getName.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw)
        else if (path.getName.endsWith(".zip")) {
          val z = new java.util.zip.ZipInputStream(raw)
          z.getNextEntry
          z
        } else raw
      try {
        // 64 MB cap: unlucky quote parity in a corrupt/binary file would
        // otherwise buffer the WHOLE file here (the probe runs this on
        // every existing target). Past the cap the file reads as
        // unreadable → quarantined — the deliberate trade: a LEGITIMATE
        // >64 MB single header row (millions of map-key columns; far past
        // anything the dynamic-shape pipeline produces under its caps)
        // would re-quarantine each run, while an uncapped read lets one
        // corrupt multi-GB object OOM every probe task that touches it.
        val cap = 64 * 1024 * 1024
        val buf = new java.io.ByteArrayOutputStream(256)
        var inQuotes = false
        var b = in.read()
        while (b >= 0 && !(b == '\n' && !inQuotes) && buf.size < cap) {
          if (b == '"') inQuotes = !inQuotes
          buf.write(b)
          b = in.read()
        }
        if (buf.size >= cap) None
        else Some(new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    } catch { case _: Exception => None }

  /** K9: move an unreadable target aside as `<name>.corrupted[-i]`.
    * A failed rename THROWS (caught by per-topic isolation): proceeding
    * would treat the still-present corrupt file as a fresh bin slot and
    * the commit's rename-over would destroy the evidence it exists to
    * preserve.
    */
  private def quarantine(fs: FileSystem, target: HPath): Unit = {
    var candidate = new HPath(target.toString + ".corrupted")
    var i = 0
    while (fs.exists(candidate)) {
      i += 1
      candidate = new HPath(target.toString + s".corrupted-$i")
    }
    if (!fs.rename(target, candidate))
      throw new java.io.IOException(s"failed to quarantine corrupt target $target -> $candidate")
  }

  private[graft] def writeJsonBins(
      spark: SparkSession, cfg: RestructureJobConfig, fs: FileSystem, topic: String,
      df: DataFrame, dataSchema: StructType, pathCol: Column, tCfg: TopicJobConfig,
      sidecar: Option[Array[Byte]] = None): WrittenBins = {
    // project by the topic's data schema (like csvColumns), NOT df.columns:
    // the frame arrives plugin-enriched, and the __-prefixed enrichment
    // structs must never reach written records or the dedup key
    val dataCols = dataSchema.fieldNames.toSeq
      .filterNot(cfg.allExcludeFields(topic))
      .map(n => col(s"`$n`"))
    val prepared = df.select(dataCols ++ Seq(
      pathCol.as("__path"), col(AvroRead.FileCol), col(AvroRead.PosCol)): _*)
    val dataOnly = StructType(prepared.schema.fields.filterNot(f =>
      Seq("__path", AvroRead.FileCol, AvroRead.PosCol).contains(f.name)))
    // A2 whole-record keep-first dedup happens inside the writer (commitBins
    // keys each rendered record)
    mergeCommitBins(spark, cfg, fs, prepared, "json", Some(dataOnly), topic, sidecar)
  }

  /** RFC4180 minimal quoting as a Column (identical rule to the CSV
    * writer's: quote when delimiter/quote/CR/LF present, double embedded
    * quotes; null → empty) — the row render runs inside codegen.
    */
  private[jobs] def csvQuoteCol(c: Column): Column = {
    val s = coalesce(c, lit(""))
    when(s.rlike("[\",\n\r]"),
      concat(lit("\""), regexp_replace(s, "\"", "\"\""), lit("\"")))
      .otherwise(s)
  }

  /** One exactly-named output file per bin: rows are rendered to their
    * final output line IN THE PLAN (`concat_ws` of quoted fields for CSV,
    * `to_json` for JSON — both codegen'd), shuffled once on the bin path,
    * and each task streams its bins straight to dot-prefixed temp files
    * (invisible to Spark readers) swapped atomically onto the target — the
    * K8 temp→target commit without a committer temp tree, per-file rename
    * pass, or driver-side zip repack. Renames parallelize across tasks, so
    * commit cost scales with executors instead of a driver pool.
    */
  /** A1 CSV dedup key: md5 over the configured key projection's rendered
    * values (null ≡ "", exactly the CSV rendering the reference hashes,
    * format/CsvAvroConverterFactory.kt:30-86 + util/Md5Hasher.kt:6-21).
    */
  private def csvDedupKey(cfg: RestructureJobConfig, topic: String,
      dataNames: Seq[String]): Column = {
    val distinctFields = cfg.dedupDistinctFields(topic)
    val ignoreFields = cfg.dedupIgnoreFields(topic)
    val keys =
      if (distinctFields.nonEmpty && distinctFields.subsetOf(dataNames.toSet))
        dataNames.filter(distinctFields)
      else if (ignoreFields.nonEmpty) dataNames.filterNot(ignoreFields)
      else dataNames
    md5(concat_ws("\u0001", keys.map(n => coalesce(col(s"`$n`"), lit(""))): _*))
  }

  private def commitBins(
      spark: SparkSession, cfg: RestructureJobConfig, fs: FileSystem,
      df: DataFrame, format: String, topic: String,
      sidecar: Option[Array[Byte]] = None): WrittenBins = {
    import spark.implicits._
    val dataCols = df.columns.toSeq
      .filterNot(Seq("__path", AvroRead.FileCol, AvroRead.PosCol).contains)
    val lineCol =
      if (format == "json")
        to_json(struct(dataCols.map(n => col(s"`$n`")): _*),
          Map("ignoreNullFields" -> "false"))
      else concat_ws(",", dataCols.map(n => csvQuoteCol(col(s"`$n`"))): _*)
    val header = if (format == "json") None
                 else Some(dataCols.map(csvQuote).mkString(","))
    // dedup runs INSIDE the writer on the already-sorted stream (A1
    // keep-last buffers one bin's survivors — the reference's own per-file
    // memory shape; A2 keep-first streams against a seen-set), so the
    // pre-shuffle dedup aggregation pass and its full-data exchange are
    // gone: rows shuffle exactly once, on the bin key
    val dedupMode =
      if (!cfg.dedupEnabled(topic)) BinWriter.DedupOff
      else if (format == "json") BinWriter.DedupKeepFirst
      else BinWriter.DedupKeepLast
    val keyCol =
      if (dedupMode == BinWriter.DedupOff) lit("")
      else if (format == "json") md5(lineCol) // A2: whole rendered record
      else csvDedupKey(cfg, topic, dataCols)
    // explicit width: with plain repartition(col), AQE coalesces this tiny
    // shuffle to one partition and a single task writes every bin file
    // serially — the file-create calls, not the rows, are the bottleneck
    val prepared = df
      .repartition(spark.sparkContext.defaultParallelism, col("__path"))
      .sortWithinPartitions(col("__path"), col(AvroRead.FileCol), col(AvroRead.PosCol))
      .select(col("__path"), keyCol.as("__key"), lineCol.as("__line"))
      .as[(String, String, String)]
    val confEntries = AvroRead.fsConfEntries(spark)
    val outputRoot = cfg.outputRoot
    val gz = cfg.gzip
    val zip = cfg.zip
    val uid = cfg.localUid
    val gid = cfg.localGid
    val sidecarEntry = sidecar.map(bytes => (s"schema-$topic.json", bytes))
    // all tasks of this commit share the runId, so the stale-temp sweep can
    // distinguish a sibling's live temp from a dead run's leftover
    val runId = java.util.UUID.randomUUID().toString
    // report = count + bounded per-task sample: the stat list must not
    // ship O(bins) strings to the driver (the write itself is untouched —
    // one task writes its partition's bins either way)
    val cap = math.max(0, cfg.maxReportedPaths)
    val parts = Timer.time("write.convert")(prepared.mapPartitions { it =>
      val out = BinWriter.writePartition(it, outputRoot, confEntries, header, gz, zip, dedupMode,
        uid, gid, sidecarEntry, runId)
      var n = 0L
      val sample = scala.collection.mutable.ArrayBuffer.empty[String]
      out.foreach { p => n += 1L; if (sample.length < cap) sample += p }
      Iterator.single((n, sample.toSeq))
    }.collect())
    WrittenBins(parts.iterator.map(_._1).sum,
      parts.iterator.flatMap(_._2).toSeq.sorted.take(cap))
  }

  /** Legacy `offsets/<topic>.csv` migration on startup (reference
    * AccountantImpl.readDeprecatedOffsets:38-53 +
    * OffsetFilePersistence.kt:70-93): pre-JSON CSV offset files under the
    * output root merge into the ledger and are deleted, then the merged
    * ledger is flushed — an upgrading deployment keeps its extraction
    * history instead of re-extracting everything.
    */
  private[graft] def migrateLegacyOffsets(
      fs: FileSystem, cfg: RestructureJobConfig, ledger: OffsetRangeSet,
      store: Option[graft.ledger.LedgerStore] = None): Unit = {
    val dir = new HPath(s"${cfg.outputRoot}/offsets")
    if (!fs.exists(dir)) return
    val csvs = fs.listStatus(dir)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".csv"))
    if (csvs.isEmpty) return
    csvs.foreach { st =>
      val in = fs.open(st.getPath)
      val content =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          new String(buf.toByteArray, "UTF-8")
        } finally in.close()
      OffsetRangeSet.addLegacyCsv(content.linesIterator, ledger)
      fs.delete(st.getPath, false)
    }
    store.fold(saveLedger(fs, cfg.ledger, ledger))(_.set(cfg.ledger, ledger.toJson))
  }

  /** Reclaim `.graft-unzip-*` temp directories orphaned by a CRASHED
    * merge/cleaner run (the in-process finally cleans them on every
    * non-crash path, and the dot-temp sweep matches only `.tmp-` names,
    * so these would otherwise live forever). One listStatus of the output
    * root per run; the age guard (`staleAgeMs`, default 1 hour — the
    * dot-temp sweep's contract) spares a concurrent instance's live temp.
    * Liveness is keyed on the NEWEST entry inside the directory, not the
    * directory's own mtime: a live unzip of a large zip store keeps
    * creating entries well past the hour, and nested writes never touch
    * the top directory's mtime — keying on the dir alone could reclaim a
    * concurrent merge's temp mid-use.
    */
  private[jobs] def sweepStaleUnzipTemps(fs: FileSystem, outputRoot: String,
      staleAgeMs: Long = 3600000L): Unit =
    try {
      val root = new HPath(outputRoot)
      if (fs.exists(root)) {
        val staleBefore = System.currentTimeMillis() - staleAgeMs
        fs.listStatus(root).foreach { st =>
          if (st.isDirectory && st.getPath.getName.startsWith(".graft-unzip-") &&
              st.getModificationTime < staleBefore) {
            // deep check only for dirs already stale by their own mtime
            // (rare: crashed or >1h-old temps). It must be RECURSIVE: unzip
            // writes leaf files several path segments down ($p.unz bin
            // paths), and creating a file updates only its immediate
            // parent's mtime — a one-level look at the top children misses
            // a live deep write and would reclaim a long-running concurrent
            // unzip mid-use. Newest FILE mtime is the liveness signal (a
            // live unzip keeps creating files).
            val newestEntry =
              try {
                var newest = st.getModificationTime
                val it = fs.listFiles(st.getPath, true)
                while (it.hasNext) newest = math.max(newest, it.next().getModificationTime)
                newest
              } catch { case _: Exception => Long.MaxValue } // unlistable → assume live
            if (newestEntry < staleBefore)
              try fs.delete(st.getPath, true) catch { case _: Exception => }
          }
        }
      }
    } catch { case _: Exception => } // reclamation is best-effort, never fails a run

  /** Serializes the cross-replica ledger read-merge-write in [[run]]'s
    * flush; '!' is illegal in Kafka topic names, so this can never collide
    * with a per-topic lock.
    */
  private[jobs] val LedgerFlushLockName = "graft!ledger-flush"

  /** TTL for [[LedgerFlushLockName]] — seconds, NOT the 24 h topic-lock
    * default: the hold is a millisecond-scale read+merge+write, so a
    * replica crashing inside it must degrade its peers to the merge-only
    * unlocked scheme for seconds (until the stale-break re-serializes the
    * flush), not for a day.
    */
  private[jobs] val LedgerFlushLockTtlMs = 15000L

  /** The lock manager [[run]]'s flush serializes through — same backend as
    * the per-topic locks, but with [[LedgerFlushLockTtlMs]]. Factored so a
    * spec can pin the wiring (the TTL a flush acquisition actually writes).
    */
  private[jobs] def flushLockManager(store: Option[graft.ledger.LedgerStore],
      cfg: RestructureJobConfig, fs: FileSystem): Option[RemoteLocks] = store match {
    case Some(s) => Some(new StoreLocks(s, cfg.redisLockPrefix, LedgerFlushLockTtlMs))
    case None => cfg.lockDir.map(d => new LockManager(fs, d, LedgerFlushLockTtlMs))
  }

  /** [[loadLedger]] for multi-instance readers: `saveLedger`'s swap is
    * atomic only under FileContext rename — the fallback is
    * delete-then-rename, leaving a window where the ledger file is MISSING
    * and a bare load would mis-read zero coverage (silent re-extraction, a
    * quieter variant of the truncating-create race saveLedger fixed). When
    * the file is absent but its parent directory exists (so a ledger HAS
    * been written before), treat the absence as transient and retry
    * briefly; first-run absence (no parent) stays an immediate empty set.
    */
  private[jobs] def loadLedgerAwaitVisible(fs: FileSystem, path: String): OffsetRangeSet = {
    val p = new HPath(path)
    // bounded: a first multi-instance run whose ledger parent pre-exists
    // (e.g. offsets.json directly under an existing output root) pays this
    // wait once per topic until the first flush creates the file
    var attempt = 0
    while (attempt < 5 && !fs.exists(p) &&
        (p.getParent != null && fs.exists(p.getParent))) {
      attempt += 1
      Thread.sleep(25)
    }
    loadLedger(fs, path)
  }

  def loadLedger(fs: FileSystem, path: String): OffsetRangeSet = {
    val p = new HPath(path)
    if (!fs.exists(p)) new OffsetRangeSet
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        OffsetRangeSet.fromJson(new String(buf.toByteArray, "UTF-8"))
      } finally in.close()
    }
  }

  def saveLedger(fs: FileSystem, path: String, ledger: OffsetRangeSet): Unit = {
    val p = new HPath(path)
    fs.mkdirs(p.getParent)
    // write-temp-then-rename: an in-place create(p, true) truncates before
    // writing, so a concurrent reader (another replica's under-lock ledger
    // refresh — the multi-instance protocol reads this file while peers
    // flush) could see an empty/partial document and spuriously fail its
    // topic. The atomic swap makes every read see a complete old or new
    // ledger.
    val tmp = new HPath(p.getParent, s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(ledger.toJson.getBytes("UTF-8")) finally out.close()
    BinWriter.renameOver(fs, fs.getConf, tmp, p)
  }
}
