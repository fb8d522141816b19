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
      pathProperties: Map[String, String] = Map.empty,
      // reference WorkerConfig.enable (--no-restructure turns it off;
      // validate() requires worker or cleaner enabled)
      workerEnabled: Boolean = true,
      // accepted-for-parity knobs with no Spark-side effect: Spark stages
      // its own shuffle/temp files (paths.temp / --tmp-dir) and has no
      // per-thread open-file cache (worker.cacheSize / --cache-size);
      // recorded so ops configs round-trip without error
      tmpDir: Option[String] = None,
      cacheSize: Option[Int] = None,
      // source.index cadences for service-mode listings (S10)
      indexFullSyncMs: Long = 3600000L,
      indexEmptyDirSyncMs: Long = 900000L,
      // cleaner.maxFilesPerTopic (SourceDataCleaner.kt:39-40)
      cleanerMaxFilesPerTopic: Option[Int] = None) {
    /** Reference RestructureConfig.validate():33 + PathFormatter init
      * checks (unknown parameters / minimal distinction) for the main,
      * bucket and per-topic templates — a config typo fails the
      * deployment with the legal parameter set named, instead of silently
      * routing every record to an `unknown-*` path component.
      */
    def validate(): Loaded = try {
      require(workerEnabled || cleanerEnabled,
        "Either restructuring or cleaning needs to be enabled.")
      // validate against the EFFECTIVE prefix names (a class-loaded
      // plugin's template prefix is its instance .name, not the class
      // name the config spells)
      val prefixNames = graft.paths.PathFormatterPlugin.prefixNames(pathPluginNames)
      def check(template: String, where: String, requireDistinction: Boolean = true): Unit =
        graft.paths.PathTemplate.validate(template, prefixNames, requireDistinction)
          .left.foreach(msg => throw new IllegalArgumentException(s"$where: $msg"))
      check(job.pathTemplate, "paths.path.format")
      job.bucketTemplate.foreach(check(_, "paths.bucket.format", requireDistinction = false))
      job.topics.foreach { case (t, tc) =>
        tc.pathTemplate.foreach(check(_, s"topics.$t.pathProperties.format"))
      }
      this
    } catch { case e: Throwable =>
      // a rejected config never reaches fromNames — drop any plugin
      // instances prefixNames parked, or they leak for the process lifetime
      graft.paths.PathFormatterPlugin.clearPrevalidated()
      throw e
    }
  }

  private def opt(n: JsonNode, path: String*): Option[JsonNode] =
    path.foldLeft(Option(n)) { (acc, p) => acc.flatMap(x => Option(x.get(p))) }
  private def str(n: JsonNode, path: String*): Option[String] =
    opt(n, path: _*).filter(!_.isNull).map(_.asText())
  private def bool(n: JsonNode, default: Boolean, path: String*): Boolean =
    opt(n, path: _*).filter(!_.isNull).fold(default)(_.asBoolean())
  private def strSet(n: JsonNode, path: String*): Set[String] =
    opt(n, path: _*).filter(_.isArray).fold(Set.empty[String])(_.elements().asScala.map(_.asText()).toSet)

  /** Like [[strSet]] but preserving YAML list order (for regex lists whose
    * config order is meaningful to the user reading errors/logs).
    */
  private def strSeq(n: JsonNode, path: String*): Seq[String] =
    opt(n, path: _*).filter(_.isArray).fold(Seq.empty[String])(_.elements().asScala.map(_.asText()).toSeq)

  /** S3: Azure credential forms → per-account Hadoop ABFS configuration,
    * with the reference's precedence (AzureConfig.kt:24-47
    * createAzureClient: username/password, then accountName/accountKey,
    * then sasToken, else anonymous/public). `cred(yamlName, envSuffix)`
    * resolves one credential field with env-over-YAML layering
    * (AzureConfig.withEnv: `{SOURCE|TARGET}_AZURE_<FIELD>`).
    *
    *  - username/password → OAuth2 client credentials
    *    (`ClientCredsTokenProvider`; the token endpoint comes from
    *    `azure.tokenEndpoint`, defaulting to Azure AD's common endpoint)
    *  - accountName/accountKey → SharedKey on the endpoint account
    *  - sasToken → fixed SAS token provider
    *
    * All keys are suffixed with the abfss URI authority so source and
    * target may use different accounts without collision.
    */
  private def azureAuthConf(account: String,
      cred: (String, String) => Option[String]): Map[String, String] = {
    val username = cred("username", "USERNAME")
    val password = cred("password", "PASSWORD")
    val accountName = cred("accountName", "ACCOUNT_NAME")
    val accountKey = cred("accountKey", "ACCOUNT_KEY")
    val sasToken = cred("sasToken", "SAS_TOKEN")
    (username, password) match {
      case (Some(u), Some(p)) => Map(
        s"fs.azure.account.auth.type.$account" -> "OAuth",
        s"fs.azure.account.oauth.provider.type.$account" ->
          "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider",
        s"fs.azure.account.oauth2.client.id.$account" -> u,
        s"fs.azure.account.oauth2.client.secret.$account" -> p,
        s"fs.azure.account.oauth2.client.endpoint.$account" ->
          cred("tokenEndpoint", "TOKEN_ENDPOINT")
            .getOrElse("https://login.microsoftonline.com/common/oauth2/token"))
      case _ => (accountName, accountKey) match {
        case (_, Some(k)) if accountName.nonEmpty => Map(
          s"fs.azure.account.auth.type.$account" -> "SharedKey",
          s"fs.azure.account.key.$account" -> k)
        case _ => sasToken match {
          case Some(t) => Map(
            s"fs.azure.account.auth.type.$account" -> "SAS",
            s"fs.azure.sas.token.provider.type.$account" ->
              "org.apache.hadoop.fs.azurebfs.sas.FixedSASTokenProvider",
            s"fs.azure.sas.fixed.token.$account" -> t.stripPrefix("?"))
          // no credentials: anonymous/public container, like the
          // reference's warning-and-continue path
          case None => Map.empty
        }
      }
    }
  }

  /** Load the reference's config surface with its layering
    * (Application.kt:214-217): YAML, then environment overrides
    * (S3Config/AzureConfig/RedisConfig `withEnv`, prefixes `SOURCE_` /
    * `TARGET_`), then command-line flags (RestructureConfig.addArgs) —
    * last writer wins.
    */
  def load(yaml: String, env: Map[String, String] = Map.empty,
           cli: CliArgs = CliArgs()): Loaded = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val root = mapper.readTree(yaml)

    // --- storage roots ------------------------------------------------
    // CLI input paths REPLACE the YAML list (reference addArgs), which may
    // hold several roots — all scanned and merged by the jobs
    val inputs: Seq[String] = {
      val fromCli = cli.inputPaths
      val fromYaml = opt(root, "paths", "inputs").filter(_.isArray)
        .fold(Seq.empty[String])(_.elements().asScala.map(_.asText()).toSeq)
      if (fromCli.nonEmpty) fromCli
      else if (fromYaml.nonEmpty) fromYaml
      else Seq("in")
    }
    val output = cli.outputDirectory
      .orElse(str(root, "paths", "output")).getOrElse("output")

    // env override beats the YAML value; empty env values are ignored
    // (reference copyEnv's `takeIf { it.isNotEmpty() }`)
    def envOrYaml(envKey: String, path: String*): Option[String] =
      env.get(envKey).filter(_.nonEmpty).orElse(str(root, path: _*).filter(_.nonEmpty))

    def resourceRoot(section: String, innerPath: String): (String, Map[String, String]) = {
      val prefix = section.toUpperCase(java.util.Locale.ROOT) + "_" // SOURCE_ / TARGET_
      str(root, section, "type").getOrElse("local") match {
        case "s3" =>
          val bucket = envOrYaml(s"${prefix}S3_BUCKET", section, "s3", "bucket").getOrElse("")
          val conf = Seq(
            envOrYaml(s"${prefix}S3_ENDPOINT", section, "s3", "endpoint")
              .map("fs.s3a.endpoint" -> _),
            envOrYaml(s"${prefix}S3_ACCESS_TOKEN", section, "s3", "accessToken")
              .map("fs.s3a.access.key" -> _),
            envOrYaml(s"${prefix}S3_SECRET_KEY", section, "s3", "secretKey")
              .map("fs.s3a.secret.key" -> _)).flatten.toMap
          (s"s3a://$bucket/$innerPath", conf)
        case "azure" =>
          val container = str(root, section, "azure", "container").getOrElse("")
          // the abfss URI authority (and the per-account Hadoop conf key
          // suffix) is the endpoint host, e.g. account.dfs.core.windows.net
          val account = str(root, section, "azure", "endpoint")
            .map(_.replaceAll("^https?://", "").replaceAll("/.*$", "")).getOrElse("")
          (s"abfss://$container@$account/$innerPath", azureAuthConf(account,
            (yamlName, envSuffix) =>
              envOrYaml(prefix + "AZURE_" + envSuffix, section, "azure", yamlName)))
        case _ => (innerPath, Map.empty)
      }
    }

    val inputResources = inputs.map(resourceRoot("source", _))
    val (inputRoot, inConf) = inputResources.head
    val extraInputRoots = inputResources.tail.map(_._1)
    val (outputRoot, outConf) = resourceRoot("target", output)

    // --- format / compression / dedup --------------------------------
    val format = cli.format.orElse(str(root, "format", "type"))
      .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("csv")
    val compressionType = cli.compression
      .orElse(str(root, "compression", "type")).map(_.toLowerCase(java.util.Locale.ROOT))
    val gzip = compressionType.contains("gzip")
    val zip = compressionType.contains("zip")
    val dedup = cli.deduplicate.getOrElse(
      bool(root, default = false, "format", "deduplication", "enable"))

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
      extraInputRoots = extraInputRoots,
      outputRoot = outputRoot,
      pathTemplate = str(root, "paths", "path", "format")
        .orElse(str(root, "paths", "properties", "format"))
        .getOrElse(graft.paths.PathTemplate.defaultTemplate),
      // G8: per-record bucket routing (reference BucketFormatterConfig.kt:4-18:
      // format string + disabledFormats regex safety net + defaultName)
      bucketTemplate = str(root, "paths", "bucket", "format"),
      bucketDisabledFormats = strSeq(root, "paths", "bucket", "disabledFormats"),
      bucketDefaultName = str(root, "paths", "bucket", "defaultName")
        .getOrElse("radar-output-storage"),
      format = format,
      gzip = gzip,
      zip = zip,
      topicParallelism = cli.numThreads.orElse(opt(root, "worker", "numThreads")
        .filter(_.isNumber).map(_.asInt())).getOrElse(1),
      dedup = dedup,
      distinctFields = strSet(root, "format", "deduplication", "distinctFields"),
      ignoreFields = strSet(root, "format", "deduplication", "ignoreFields"),
      excludeFields = strSet(root, "format", "excludeFields"),
      topics = topics,
      // reference: redis-backed per-topic locks; here a lock DIRECTORY on
      // the target FS (semantics of RedisRemoteLockManager on atomic
      // create-exclusive files)
      lockDir = str(root, "worker", "lockDir"),
      // CLI below 1 disables the limit (CommandLineArgs.kt maxFilesPerTopic
      // doc), even one set in YAML
      maxFilesPerTopic = cli.maxFilesPerTopic
        .fold(opt(root, "worker", "maxFilesPerTopic")
          .filter(n => n.isNumber).map(_.asInt()))(v => Some(v).filter(_ >= 1)),
      minimumFileAgeMs = opt(root, "worker", "minimumFileAge")
        .filter(_.isNumber).map(_.asLong() * 1000).getOrElse(60000L),
      // engine tuning knobs beyond the reference surface (documented in
      // their case-class comments): the dynamic-schema shape cap and the
      // merge-planning chunk size — the failure cure for the former names
      // `worker.maxSchemaFingerprints`, so the YAML path must exist
      maxSchemaFingerprints = opt(root, "worker", "maxSchemaFingerprints")
        .filter(_.isNumber).map(_.asInt()).getOrElse(256),
      mergeChunkBins = opt(root, "worker", "mergeChunkBins")
        .filter(_.isNumber).map(_.asInt()).getOrElse(100000),
      maxReportedPaths = opt(root, "worker", "maxReportedPaths")
        .filter(_.isNumber).map(_.asInt()).getOrElse(1000),
      staleTempAgeMs = opt(root, "worker", "staleTempAgeMs")
        .filter(_.isNumber).map(_.asLong()).getOrElse(3600000L),
      // S9: close open-ended ranges from object tags (S3) / blob metadata
      // (Azure) — reference S3Config.endOffsetFromTags,
      // AzureConfig.endOffsetFromMetadata
      endOffsetFromTags =
        bool(root, default = false, "source", "s3", "endOffsetFromTags") ||
        bool(root, default = false, "source", "azure", "endOffsetFromMetadata"),
      // reference RedisConfig: uri + lockPrefix — ledger in Redis under the
      // ledger-path key, locks via SET NX PX
      // target.local.{userId,groupId} → unix owner of written files
      localUid = opt(root, "target", "local", "userId")
        .filter(_.isNumber).map(_.asInt()).getOrElse(-1),
      localGid = opt(root, "target", "local", "groupId")
        .filter(_.isNumber).map(_.asInt()).getOrElse(-1),
      // RedisConfig.withEnv: REDIS_URI overrides the YAML uri
      redisUri = env.get("REDIS_URI").filter(_.nonEmpty).orElse(str(root, "redis", "uri")),
      redisLockPrefix = str(root, "redis", "lockPrefix")
        .map(p => s"$p/lock").getOrElse("radar-output/lock"))

    Loaded(
      job = job,
      hadoopConf = inConf ++ outConf,
      serviceEnabled = cli.asService.getOrElse(
        bool(root, default = false, "service", "enable")),
      serviceIntervalSec = cli.pollInterval.orElse(
        opt(root, "service", "interval").map(_.asLong())).getOrElse(300L),
      cleanerEnabled = cli.clean.getOrElse(
        bool(root, default = false, "cleaner", "enable")),
      cleanerAgeDays = opt(root, "cleaner", "age").map(_.asInt()).getOrElse(7),
      cleanerIntervalSec = opt(root, "cleaner", "interval").map(_.asLong()).getOrElse(1260L),
      pathPluginNames = pathPluginNames,
      pathProperties = pathProperties,
      workerEnabled = !cli.noRestructure.getOrElse(
        !bool(root, default = true, "worker", "enable")),
      // source.index cadences (StorageIndexConfig.kt: fullSyncInterval
      // 3600 s, emptyDirectorySyncInterval 900 s), seconds → ms
      indexFullSyncMs = opt(root, "source", "index", "fullSyncInterval")
        .filter(_.isNumber).map(_.asLong() * 1000).getOrElse(3600000L),
      indexEmptyDirSyncMs = opt(root, "source", "index", "emptyDirectorySyncInterval")
        .filter(_.isNumber).map(_.asLong() * 1000).getOrElse(900000L),
      cleanerMaxFilesPerTopic = opt(root, "cleaner", "maxFilesPerTopic")
        .filter(_.isNumber).map(_.asInt()),
      tmpDir = cli.tmpDir.orElse(str(root, "paths", "temp")),
      cacheSize = cli.cacheSize.orElse(
        opt(root, "worker", "cacheSize").filter(_.isNumber).map(_.asInt())))
  }
}
