package graft.jobs

import graft.paths.PathTemplate

/** Job configuration mirroring the semantics of the reference's
  * `restructure.yml` surface (config/RestructureConfig.kt,
  * config/TopicConfig.kt, config/FormatConfig.kt) — as plain case classes;
  * the YAML front-end is orthogonal to engine behavior.
  */
final case class TopicJobConfig(
    pathTemplate: Option[String] = None,      // topics.<t>.pathProperties.format
    exclude: Boolean = false,                 // topics.<t>.exclude
    excludeFromDelete: Boolean = false,       // topics.<t>.excludeFromDelete
    excludeFields: Set[String] = Set.empty,   // flattened-name projection drop
    distinctFields: Set[String] = Set.empty,  // dedup key fields
    ignoreFields: Set[String] = Set.empty)    // dedup ignored fields

final case class RestructureJobConfig(
    inputRoot: String,
    outputRoot: String,
    pathTemplate: String = PathTemplate.defaultTemplate,
    format: String = "csv",                   // csv | json
    gzip: Boolean = false,
    dedup: Boolean = false,                   // format.deduplication.enable
    topics: Map[String, TopicJobConfig] = Map.empty,
    ledgerPath: Option[String] = None,        // default <outputRoot>/_ledger.json
    maxFilesPerTopic: Option[Int] = None,
    minimumFileAgeMs: Long = 0L,
    timeBinFormat: String = "yyyyMMdd_HH00") {

  def ledger: String = ledgerPath.getOrElse(s"$outputRoot/_ledger.json")
  def extension: String =
    (if (format == "json") ".json" else ".csv") + (if (gzip) ".gz" else "")
  def topicConfig(topic: String): TopicJobConfig =
    topics.getOrElse(topic, TopicJobConfig())
}
