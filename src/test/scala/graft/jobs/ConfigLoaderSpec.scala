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
