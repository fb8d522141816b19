package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

class ConfigLoaderSpec extends AnyFunSuite {

  private val yml =
    """service:
      |  enable: true
      |  interval: 30
      |source:
      |  type: s3
      |  s3:
      |    endpoint: http://localhost:9000
      |    bucket: radar
      |    accessToken: ak
      |    secretKey: sk
      |target:
      |  type: local
      |compression:
      |  type: gzip
      |format:
      |  type: csv
      |  deduplication:
      |    enable: true
      |    distinctFields: [key.sourceId, value.time]
      |  excludeFields: [key.projectId]
      |worker:
      |  maxFilesPerTopic: 7
      |  minimumFileAge: 60
      |  maxSchemaFingerprints: 32
      |  mergeChunkBins: 5000
      |  maxReportedPaths: 7
      |  staleTempAgeMs: 7200000
      |cleaner:
      |  enable: true
      |  age: 7
      |paths:
      |  inputs: [in]
      |  output: out
      |  properties:
      |    format: ${projectId}/${userId}/${topic}/${filename}
      |topics:
      |  topic_a:
      |    deduplication:
      |      enable: false
      |    excludeFields: [value.x]
      |  topic_b:
      |    exclude: true
      |  topic_c:
      |    pathProperties:
      |      format: ${projectId}/${topic}/${value:name}/${filename}
      |""".stripMargin

  test("restructure.yml surface maps to job config") {
    val l = ConfigLoader.load(yml)
    assert(l.job.inputRoot == "s3a://radar/in")
    assert(l.hadoopConf("fs.s3a.endpoint") == "http://localhost:9000")
    assert(l.hadoopConf("fs.s3a.access.key") == "ak")
    assert(l.job.outputRoot == "out")
    assert(l.job.gzip)
    assert(l.job.extension == ".csv.gz")
    assert(l.job.dedup && l.job.distinctFields == Set("key.sourceId", "value.time"))
    assert(l.job.excludeFields == Set("key.projectId"))
    assert(l.job.maxFilesPerTopic.contains(7))
    assert(l.job.minimumFileAgeMs == 60000L)
    assert(l.job.maxSchemaFingerprints == 32)
    assert(l.job.mergeChunkBins == 5000)
    assert(l.job.maxReportedPaths == 7)
    assert(l.job.staleTempAgeMs == 7200000L)
    assert(l.job.pathTemplate == "${projectId}/${userId}/${topic}/${filename}")
    assert(!l.job.dedupEnabled("topic_a")) // per-topic override
    assert(l.job.dedupEnabled("topic_x"))  // global default
    assert(l.job.allExcludeFields("topic_a") == Set("key.projectId", "value.x"))
    assert(l.job.topicConfig("topic_b").exclude)
    assert(l.job.topicConfig("topic_c").pathTemplate.contains(
      "${projectId}/${topic}/${value:name}/${filename}"))
    assert(l.serviceEnabled && l.serviceIntervalSec == 30)
    assert(l.cleanerEnabled && l.cleanerAgeDays == 7)
  }

  test("validate rejects unknown template parameters with the legal set named") {
    // reference PathFormatter.kt:47-51 — a typo fails the deployment,
    // never silently routes to unknown-* forever
    val base = ConfigLoader.load(yml)
    val typo = base.copy(job = base.job.copy(
      pathTemplate = "${projectId}/${userd}/${topic}/${filename}"))
    val e = intercept[IllegalArgumentException](typo.validate())
    assert(e.getMessage.contains("userd") && e.getMessage.contains("Legal parameter names")
      && e.getMessage.contains("paths.path.format"), e.getMessage)
    // per-topic templates validate too
    val topicTypo = base.copy(job = base.job.copy(topics = base.job.topics +
      ("topic_z" -> TopicJobConfig(pathTemplate = Some("${topik}/${filename}")))))
    val e2 = intercept[IllegalArgumentException](topicTypo.validate())
    assert(e2.getMessage.contains("topics.topic_z") && e2.getMessage.contains("topik"), e2.getMessage)
    // prefixed lookups and known params pass; bucket templates skip the
    // topic/filename distinction requirement (checkMinimalDistinction=false)
    base.copy(job = base.job.copy(
      pathTemplate = "${projectId}/${key:a.b}/${value:x}/${time:yyyyMM}/${topic}/${filename}",
      bucketTemplate = Some("bucket-${value:serverStatus}"))).validate()
    // a plugin-prefixed param is legal iff the plugin is configured
    val withMp = base.copy(
      job = base.job.copy(pathTemplate = "${mp:organization}/${topic}/${filename}"),
      pathPluginNames = Seq("fixed", "time", "mp"))
    withMp.validate()
    val noMp = base.copy(
      job = base.job.copy(pathTemplate = "${mp:organization}/${topic}/${filename}"))
    val e3 = intercept[IllegalArgumentException](noMp.validate())
    assert(e3.getMessage.contains("mp:organization"), e3.getMessage)
  }

  test("paths.path.plugins + paths.properties round-trip (mp: plugin wiring)") {
    val l = ConfigLoader.load(
      """paths:
        |  path:
        |    format: ${projectId}/${mp:group}/${topic}/${filename}
        |    plugins: fixed time key value mp
        |  properties:
        |    managementPortalUrl: http://localhost:8080/managementportal
        |    managementPortalClientId: radar_restructure
        |""".stripMargin)
    assert(l.pathPluginNames == Seq("fixed", "time", "key", "value", "mp"))
    assert(l.job.bucketTemplate.isEmpty)
    // G8 bucket routing template (paths.bucket.format)
    val withBucket = ConfigLoader.load(
      """paths:
        |  bucket:
        |    format: prod-${projectId}
        |""".stripMargin)
    assert(withBucket.job.bucketTemplate.contains("prod-${projectId}"))
    // defaults mirror BucketFormatterConfig.kt: no disabled regexes, the
    // reference's safety-net bucket name
    assert(withBucket.job.bucketDisabledFormats.isEmpty)
    assert(withBucket.job.bucketDefaultName == "radar-output-storage")
    // disabledFormats/defaultName (BucketFormatterConfig.kt:12-18), list
    // order preserved
    val withFallback = ConfigLoader.load(
      """paths:
        |  bucket:
        |    format: prod-${projectId}
        |    disabledFormats:
        |      - prod-unknown.*
        |      - ".*[^a-z0-9-].*"
        |    defaultName: safe-bucket
        |""".stripMargin)
    assert(withFallback.job.bucketDisabledFormats ==
      Seq("prod-unknown.*", ".*[^a-z0-9-].*"))
    assert(withFallback.job.bucketDefaultName == "safe-bucket")
    assert(l.pathProperties("managementPortalUrl") == "http://localhost:8080/managementportal")
    assert(l.pathProperties("managementPortalClientId") == "radar_restructure")
    assert(l.job.pathTemplate == "${projectId}/${mp:group}/${topic}/${filename}")
    // the registry constructs the mp plugin from those names + properties
    // (its REST fetch is validated on construction, performed on first use)
    val plugins = graft.paths.PathFormatterPlugin.fromNames(l.pathPluginNames, l.pathProperties)
    assert(plugins.map(_.name) == Seq("mp"))
    // missing managementPortalUrl fails fast, like the reference's requireNotNull
    val e = intercept[IllegalArgumentException] {
      graft.paths.PathFormatterPlugin.fromNames(Seq("mp"), Map.empty)
    }
    assert(e.getMessage.contains("managementPortalUrl"))
    // a typo'd plugin name fails fast instead of silently resolving every
    // ${name:...} param to its 'unknown-*' fallback
    val typo = intercept[IllegalArgumentException] {
      graft.paths.PathFormatterPlugin.fromNames(Seq("mpp"), Map.empty)
    }
    assert(typo.getMessage.contains("mpp"))
    // a loadable class that is not a PathFormatterPlugin is also an error
    val notPlugin = intercept[IllegalArgumentException] {
      graft.paths.PathFormatterPlugin.fromNames(Seq("java.lang.Object"), Map.empty)
    }
    assert(notPlugin.getMessage.contains("does not"))
  }

  test("defaults for an empty config") {
    val l = ConfigLoader.load("{}")
    assert(l.job.inputRoot == "in" && l.job.outputRoot == "output")
    assert(!l.job.gzip && !l.job.dedup && !l.serviceEnabled)
    assert(l.job.minimumFileAgeMs == 60000L)
    assert(l.job.redisUri.isEmpty && l.job.ledgerStore().isEmpty)
  }

  private def azureYml(creds: String): String =
    s"""target:
       |  type: azure
       |  azure:
       |    endpoint: https://acct.dfs.core.windows.net
       |    container: data
       |$creds""".stripMargin

  test("azure accountName/accountKey map to SharedKey Hadoop conf") {
    val l = ConfigLoader.load(azureYml(
      """    accountName: acct
        |    accountKey: key0==
        |""".stripMargin))
    assert(l.job.outputRoot == "abfss://data@acct.dfs.core.windows.net/output")
    assert(l.hadoopConf("fs.azure.account.auth.type.acct.dfs.core.windows.net") == "SharedKey")
    assert(l.hadoopConf("fs.azure.account.key.acct.dfs.core.windows.net") == "key0==")
  }

  test("azure sasToken maps to a fixed SAS token provider") {
    val l = ConfigLoader.load(azureYml("    sasToken: \"?sv=2024&sig=abc\"\n"))
    val h = "acct.dfs.core.windows.net"
    assert(l.hadoopConf(s"fs.azure.account.auth.type.$h") == "SAS")
    assert(l.hadoopConf(s"fs.azure.sas.token.provider.type.$h")
      == "org.apache.hadoop.fs.azurebfs.sas.FixedSASTokenProvider")
    // leading '?' stripped: Hadoop expects the bare query string
    assert(l.hadoopConf(s"fs.azure.sas.fixed.token.$h") == "sv=2024&sig=abc")
  }

  test("azure username/password map to OAuth client credentials") {
    val l = ConfigLoader.load(azureYml(
      """    username: client-id
        |    password: client-secret
        |""".stripMargin))
    val h = "acct.dfs.core.windows.net"
    assert(l.hadoopConf(s"fs.azure.account.auth.type.$h") == "OAuth")
    assert(l.hadoopConf(s"fs.azure.account.oauth2.client.id.$h") == "client-id")
    assert(l.hadoopConf(s"fs.azure.account.oauth2.client.secret.$h") == "client-secret")
    assert(l.hadoopConf(s"fs.azure.account.oauth2.client.endpoint.$h")
      .contains("login.microsoftonline.com"))
  }

  test("azure credential precedence matches AzureConfig.createAzureClient") {
    // username/password beats accountName/accountKey beats sasToken
    val all = ConfigLoader.load(azureYml(
      """    username: u
        |    password: p
        |    accountName: acct
        |    accountKey: k
        |    sasToken: s
        |""".stripMargin))
    val h = "acct.dfs.core.windows.net"
    assert(all.hadoopConf(s"fs.azure.account.auth.type.$h") == "OAuth")
    val keyAndSas = ConfigLoader.load(azureYml(
      """    accountName: acct
        |    accountKey: k
        |    sasToken: s
        |""".stripMargin))
    assert(keyAndSas.hadoopConf(s"fs.azure.account.auth.type.$h") == "SharedKey")
    // no credentials: public container, no auth conf (reference warns + continues)
    val anon = ConfigLoader.load(azureYml(""))
    assert(!anon.hadoopConf.keys.exists(_.startsWith("fs.azure.account.auth")))
  }

  test("environment overrides beat YAML (reference withEnv)") {
    val l = ConfigLoader.load(yml, env = Map(
      "SOURCE_S3_ACCESS_TOKEN" -> "env-ak",
      "SOURCE_S3_BUCKET" -> "env-bucket",
      "SOURCE_S3_SECRET_KEY" -> "",          // empty env values are ignored
      "REDIS_URI" -> "redis://env-host:7000"))
    assert(l.hadoopConf("fs.s3a.access.key") == "env-ak")
    assert(l.job.inputRoot == "s3a://env-bucket/in")
    assert(l.hadoopConf("fs.s3a.secret.key") == "sk")
    assert(l.job.redisUri.contains("redis://env-host:7000"))
    // azure env form: TARGET_AZURE_ACCOUNT_KEY with no YAML credentials
    val az = ConfigLoader.load(azureYml(""), env = Map(
      "TARGET_AZURE_ACCOUNT_NAME" -> "acct",
      "TARGET_AZURE_ACCOUNT_KEY" -> "env-key"))
    assert(az.hadoopConf("fs.azure.account.key.acct.dfs.core.windows.net") == "env-key")
  }

  test("CLI flags beat env and YAML (reference addArgs order)") {
    val cli = CliArgs.parse(Seq(
      "-f", "json", "-c", "zip", "-d", "-o", "cli-out", "-t", "4",
      "--max-files-per-topic", "3", "-S", "-i", "45", "-C", "custom-in"))
    val l = ConfigLoader.load(yml, env = Map.empty, cli = cli)
    assert(l.job.format == "json")
    assert(l.job.zip && !l.job.gzip)        // YAML said gzip; CLI wins
    assert(l.job.dedup)
    assert(l.job.outputRoot == "cli-out")   // target is local in yml
    assert(l.job.inputRoot == "s3a://radar/custom-in") // positional input path
    assert(l.job.topicParallelism == 4)
    assert(l.job.maxFilesPerTopic.contains(3))
    assert(l.serviceEnabled && l.serviceIntervalSec == 45)
    assert(l.cleanerEnabled)
    // below-1 disables the YAML limit (CommandLineArgs.kt)
    val noLimit = ConfigLoader.load(yml,
      cli = CliArgs.parse(Seq("--max-files-per-topic", "0")))
    assert(noLimit.job.maxFilesPerTopic.isEmpty)
  }

  test("CliArgs.parse covers the reference flag surface") {
    val a = CliArgs.parse(Seq("-F", "conf.yml", "--no-restructure", "--tmp-dir",
      "/tmp/stage", "-s", "200", "--timer", "in1", "in2"))
    assert(a.configFile.contains("conf.yml"))
    assert(a.noRestructure.contains(true))
    assert(a.tmpDir.contains("/tmp/stage"))
    assert(a.cacheSize.contains(200))
    assert(a.inputPaths == Seq("in1", "in2"))
    assert(CliArgs.parse(Seq("--once")).asService.contains(false))
    assert(CliArgs.parse(Seq("-h")).help)
    intercept[IllegalArgumentException](CliArgs.parse(Seq("--bogus")))
    intercept[IllegalArgumentException](CliArgs.parse(Seq("-t", "0")))
    // validate(): worker or cleaner must be enabled
    val off = ConfigLoader.load("{}", cli = CliArgs.parse(Seq("--no-restructure")))
    intercept[IllegalArgumentException](off.validate())
    assert(ConfigLoader.load("{}", cli =
      CliArgs.parse(Seq("--no-restructure", "-C"))).validate().cleanerEnabled)
  }

  test("source.index cadences and cleaner.maxFilesPerTopic map through") {
    val l = ConfigLoader.load(
      """source:
        |  index:
        |    fullSyncInterval: 7200
        |    emptyDirectorySyncInterval: 120
        |cleaner:
        |  enable: true
        |  maxFilesPerTopic: 5
        |""".stripMargin)
    assert(l.indexFullSyncMs == 7200000L)
    assert(l.indexEmptyDirSyncMs == 120000L)
    assert(l.cleanerMaxFilesPerTopic.contains(5))
    // StorageIndexConfig.kt defaults: 3600 s / 900 s
    val d = ConfigLoader.load("{}")
    assert(d.indexFullSyncMs == 3600000L && d.indexEmptyDirSyncMs == 900000L)
    assert(d.cleanerMaxFilesPerTopic.isEmpty)
  }

  test("redis: uri + lockPrefix map to the RESP ledger/lock backend") {
    val l = ConfigLoader.load(
      """redis:
        |  uri: redis://redis-host:6380
        |  lockPrefix: my-prefix
        |""".stripMargin)
    assert(l.job.redisUri.contains("redis://redis-host:6380"))
    assert(l.job.redisLockPrefix == "my-prefix/lock")
    // reference default prefix
    assert(ConfigLoader.load("redis:\n  uri: redis://h\n").job.redisLockPrefix
      == "radar-output/lock")
  }
}
