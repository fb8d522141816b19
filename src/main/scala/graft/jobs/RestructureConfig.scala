package graft.jobs

import graft.paths.PathTemplate

/** Job configuration mirroring the semantics of the reference's
  * `restructure.yml` surface (config/RestructureConfig.kt,
  * config/TopicConfig.kt, config/FormatConfig.kt) — as plain case classes;
  * [[ConfigLoader]] provides the YAML front-end.
  */
final case class TopicJobConfig(
    pathTemplate: Option[String] = None,      // topics.<t>.pathProperties.format
    exclude: Boolean = false,                 // topics.<t>.exclude
    excludeFromDelete: Boolean = false,       // topics.<t>.excludeFromDelete
    excludeFields: Set[String] = Set.empty,   // flattened-name projection drop
    dedup: Option[Boolean] = None,            // topics.<t>.deduplication.enable
    distinctFields: Set[String] = Set.empty,  // dedup key fields
    ignoreFields: Set[String] = Set.empty)    // dedup ignored fields

final case class RestructureJobConfig(
    inputRoot: String,
    // paths.inputs beyond the first (reference takes a LIST of input
    // paths, config/PathConfig inputs / CommandLineArgs variable arity);
    // all roots are scanned and their topic trees merged
    extraInputRoots: Seq[String] = Nil,
    outputRoot: String,
    pathTemplate: String = PathTemplate.defaultTemplate,
    bucketTemplate: Option[String] = None,    // G8 per-record bucket routing
    // Bucket-name safety net (reference BucketFormatterConfig.kt:12-18,
    // FormattedPathFactory.kt:51-60): a formatted bucket name that
    // FULL-matches any of these case-insensitive regexes is replaced by
    // bucketDefaultName — e.g. a deployment whose computed name comes out
    // empty/invalid writes to the default bucket instead of a bad one
    bucketDisabledFormats: Seq[String] = Nil,
    bucketDefaultName: String = "radar-output-storage",
    format: String = "csv",                   // csv | json
    gzip: Boolean = false,
    zip: Boolean = false,                     // K6: single-entry zip, level 7
    topicParallelism: Int = 1,                // worker.numThreads analog
    dedup: Boolean = false,                   // format.deduplication.enable
    distinctFields: Set[String] = Set.empty,  // global dedup key fields
    ignoreFields: Set[String] = Set.empty,
    excludeFields: Set[String] = Set.empty,   // format.excludeFields
    topics: Map[String, TopicJobConfig] = Map.empty,
    ledgerPath: Option[String] = None,        // default <outputRoot>/_ledger.json
    lockDir: Option[String] = None,           // multi-instance per-topic locks
    maxFilesPerTopic: Option[Int] = None,
    // bound on distinct map-key/array-arity header shapes one dynamic-topic
    // batch may produce: each shape is one pass over the batch's persisted
    // frame (linear in shapes), so a runaway producer fails fast with a
    // cure instead of grinding through thousands of passes
    maxSchemaFingerprints: Int = 256,
    // driver-heap ceiling for merge planning: a re-run whose batch touches
    // more than this many PRE-EXISTING bins is planned and committed in
    // chunks of this size (Restructure.mergeCommitBins), so the driver
    // never holds the full existing-path list; the default bounds the
    // residue at ~10 MB of path strings while keeping normal appends on
    // the single-commit fast path
    mergeChunkBins: Int = 100000,
    // bound on the per-run written-paths REPORT (TopicResult.bins.sample):
    // bin counts are always exact; only this many path strings ever reach
    // the driver for reporting — the report was the last O(bins) driver
    // list
    maxReportedPaths: Int = 1000,
    // age before an orphaned `.graft-unzip-*` temp is reclaimed at job
    // entry; large-zip-store deployments whose unzip phase legitimately
    // runs long should raise it (liveness is additionally keyed on the
    // temp's newest entry, so only a fully idle temp is ever reclaimed)
    staleTempAgeMs: Long = 3600000L,
    minimumFileAgeMs: Long = 0L,
    timeBinFormat: String = "yyyyMMdd_HH00",
    // G6: enrichment-backed path-template plugins (e.g. `mp:`), applied to
    // the record frame before path compilation (paths.path.plugins)
    pathPlugins: Seq[graft.paths.PathFormatterPlugin] = Nil,
    // S9: close open-ended file ranges from per-object tags/metadata
    // (reference endOffsetFromTags / endOffsetFromMetadata). The flag turns
    // on the Hadoop-XAttr lookup; endOffsetSource overrides it with a
    // custom tag source (tests, exports)
    endOffsetFromTags: Boolean = false,
    endOffsetSource: Option[graft.sources.EndOffsetSource] = None,
    // Redis-protocol ledger + lock backend (reference `redis:` config —
    // OffsetRedisPersistence + RedisRemoteLockManager). None = filesystem
    // ledger/locks (the default backend)
    redisUri: Option[String] = None,
    redisLockPrefix: String = "radar-output/lock",
    // target.local.{userId,groupId}: unix owner for written files/dirs on
    // local targets (reference LocalConfig.kt); -1 = leave as-is
    localUid: Int = -1,
    localGid: Int = -1) {

  /** The configured ledger/lock store, if any (caller closes). */
  def ledgerStore(): Option[graft.ledger.LedgerStore] =
    redisUri.map(graft.ledger.RespLedgerStore.fromUri)

  def tagOffsetSource(conf: org.apache.hadoop.conf.Configuration)
      : Option[graft.sources.EndOffsetSource] =
    endOffsetSource.orElse(
      if (endOffsetFromTags) Some(new graft.sources.EndOffsetSource.HadoopXAttr(conf)) else None)

  def ledger: String = ledgerPath.getOrElse(s"$outputRoot/_ledger.json")
  def extension: String =
    (if (format == "json") ".json" else ".csv") +
      (if (gzip) ".gz" else if (zip) ".zip" else "")
  def topicConfig(topic: String): TopicJobConfig =
    topics.getOrElse(topic, TopicJobConfig())
  def dedupEnabled(topic: String): Boolean =
    topicConfig(topic).dedup.getOrElse(dedup)
  def dedupDistinctFields(topic: String): Set[String] = {
    val t = topicConfig(topic).distinctFields
    if (t.nonEmpty) t else distinctFields
  }
  def dedupIgnoreFields(topic: String): Set[String] = {
    val t = topicConfig(topic).ignoreFields
    if (t.nonEmpty) t else ignoreFields
  }
  def allExcludeFields(topic: String): Set[String] =
    excludeFields ++ topicConfig(topic).excludeFields
}
