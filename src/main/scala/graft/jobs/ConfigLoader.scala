package graft.jobs

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** `restructure.yml`-compatible configuration front-end (the reference's
  * query surface, config/RestructureConfig.kt:36-66): YAML → job configs.
  * Storage resources map to Hadoop filesystem URIs + configuration
  * (`s3a://bucket/...` with endpoint/credential settings), which is how a
  * Spark cluster addresses the same S3/Azure storage the reference does.
  */
object ConfigLoader {

  final case class Loaded(
      job: RestructureJobConfig,
      hadoopConf: Map[String, String],
      serviceEnabled: Boolean, serviceIntervalSec: Long,
      cleanerEnabled: Boolean, cleanerAgeDays: Int, cleanerIntervalSec: Long,
      // G6: paths.path.plugins names (reference PathFormatterConfig.kt:10,
      // default "fixed time key value") + paths.properties passed to plugin
      // factories; the session-holding caller instantiates them via
      // PathFormatterPlugin.fromNames and sets job.pathPlugins
      pathPluginNames: Seq[String] = Seq("fixed", "time", "key", "value"),
      pathProperties: Map[String, String] = Map.empty)

  private def opt(n: JsonNode, path: String*): Option[JsonNode] =
    path.foldLeft(Option(n)) { (acc, p) => acc.flatMap(x => Option(x.get(p))) }
  private def str(n: JsonNode, path: String*): Option[String] =
    opt(n, path: _*).filter(!_.isNull).map(_.asText())
  private def bool(n: JsonNode, default: Boolean, path: String*): Boolean =
    opt(n, path: _*).filter(!_.isNull).fold(default)(_.asBoolean())
  private def strSet(n: JsonNode, path: String*): Set[String] =
    opt(n, path: _*).filter(_.isArray).fold(Set.empty[String])(_.elements().asScala.map(_.asText()).toSet)

  def load(yaml: String): Loaded = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val root = mapper.readTree(yaml)

    // --- storage roots ------------------------------------------------
    val input0 = opt(root, "paths", "inputs").filter(_.isArray)
      .flatMap(a => a.elements().asScala.toSeq.headOption).map(_.asText()).getOrElse("in")
    val output = str(root, "paths", "output").getOrElse("output")

    def resourceRoot(section: String, innerPath: String): (String, Map[String, String]) =
      str(root, section, "type").getOrElse("local") match {
        case "s3" =>
          val bucket = str(root, section, "s3", "bucket").getOrElse("")
          val conf = Seq(
            str(root, section, "s3", "endpoint").map("fs.s3a.endpoint" -> _),
            str(root, section, "s3", "accessToken").map("fs.s3a.access.key" -> _),
            str(root, section, "s3", "secretKey").map("fs.s3a.secret.key" -> _)).flatten.toMap
          (s"s3a://$bucket/$innerPath", conf)
        case "azure" =>
          val container = str(root, section, "azure", "container").getOrElse("")
          val account = str(root, section, "azure", "endpoint")
            .map(_.replaceAll("^https?://", "").replaceAll("/.*$", "")).getOrElse("")
          (s"abfss://$container@$account/$innerPath", Map.empty)
        case _ => (innerPath, Map.empty)
      }

    val (inputRoot, inConf) = resourceRoot("source", input0)
    val (outputRoot, outConf) = resourceRoot("target", output)

    // --- format / compression / dedup --------------------------------
    val format = str(root, "format", "type").map(_.toLowerCase).getOrElse("csv")
    val compressionType = str(root, "compression", "type").map(_.toLowerCase)
    val gzip = compressionType.contains("gzip")
    val zip = compressionType.contains("zip")
    val dedup = bool(root, default = false, "format", "deduplication", "enable")

    // --- topics -------------------------------------------------------
    val topics = opt(root, "topics").filter(_.isObject).fold(Map.empty[String, TopicJobConfig]) { t =>
      t.properties().asScala.map { e =>
        val n = e.getValue
        e.getKey -> TopicJobConfig(
          pathTemplate = str(n, "pathProperties", "format"),
          exclude = bool(n, default = false, "exclude"),
          excludeFromDelete = bool(n, default = false, "excludeFromDelete"),
          excludeFields = strSet(n, "excludeFields"),
          dedup = opt(n, "deduplication", "enable").map(_.asBoolean()),
          distinctFields = strSet(n, "deduplication", "distinctFields"),
          ignoreFields = strSet(n, "deduplication", "ignoreFields"))
      }.toMap
    }

    // reference PathFormatterConfig: template + plugin list under
    // paths.path, plugin factory properties under paths.properties
    // (paths.properties.format kept as the template's legacy location)
    val pathPluginNames = str(root, "paths", "path", "plugins")
      .getOrElse("fixed time key value").split("\\s+").toSeq.filter(_.nonEmpty)
    val pathProperties = opt(root, "paths", "properties").filter(_.isObject)
      .fold(Map.empty[String, String]) { p =>
        p.properties().asScala
          .filter(e => e.getValue.isValueNode && e.getKey != "format")
          .map(e => e.getKey -> e.getValue.asText()).toMap
      }

    val job = RestructureJobConfig(
      inputRoot = inputRoot,
      outputRoot = outputRoot,
      pathTemplate = str(root, "paths", "path", "format")
        .orElse(str(root, "paths", "properties", "format"))
        .getOrElse(graft.paths.PathTemplate.defaultTemplate),
      // G8: per-record bucket routing (reference BucketFormatterConfig.kt:4-8
      // — the format string; disabledFormats/defaultName are an S3-naming
      // concern the Hadoop-URI output root does not share)
      bucketTemplate = str(root, "paths", "bucket", "format"),
      format = format,
      gzip = gzip,
      zip = zip,
      topicParallelism = opt(root, "worker", "numThreads")
        .filter(_.isNumber).map(_.asInt()).getOrElse(1),
      dedup = dedup,
      distinctFields = strSet(root, "format", "deduplication", "distinctFields"),
      ignoreFields = strSet(root, "format", "deduplication", "ignoreFields"),
      excludeFields = strSet(root, "format", "excludeFields"),
      topics = topics,
      // reference: redis-backed per-topic locks; here a lock DIRECTORY on
      // the target FS (semantics of RedisRemoteLockManager on atomic
      // create-exclusive files)
      lockDir = str(root, "worker", "lockDir"),
      maxFilesPerTopic = opt(root, "worker", "maxFilesPerTopic")
        .filter(n => n.isNumber).map(_.asInt()),
      minimumFileAgeMs = opt(root, "worker", "minimumFileAge")
        .filter(_.isNumber).map(_.asLong() * 1000).getOrElse(60000L),
      // S9: close open-ended ranges from object tags (S3) / blob metadata
      // (Azure) — reference S3Config.endOffsetFromTags,
      // AzureConfig.endOffsetFromMetadata
      endOffsetFromTags =
        bool(root, default = false, "source", "s3", "endOffsetFromTags") ||
        bool(root, default = false, "source", "azure", "endOffsetFromMetadata"),
      // reference RedisConfig: uri + lockPrefix — ledger in Redis under the
      // ledger-path key, locks via SET NX PX
      redisUri = str(root, "redis", "uri"),
      redisLockPrefix = str(root, "redis", "lockPrefix")
        .map(p => s"$p/lock").getOrElse("radar-output/lock"))

    Loaded(
      job = job,
      hadoopConf = inConf ++ outConf,
      serviceEnabled = bool(root, default = false, "service", "enable"),
      serviceIntervalSec = opt(root, "service", "interval").map(_.asLong()).getOrElse(300L),
      cleanerEnabled = bool(root, default = false, "cleaner", "enable"),
      cleanerAgeDays = opt(root, "cleaner", "age").map(_.asInt()).getOrElse(7),
      cleanerIntervalSec = opt(root, "cleaner", "interval").map(_.asLong()).getOrElse(1260L),
      pathPluginNames = pathPluginNames,
      pathProperties = pathProperties)
  }
}
