package graft.paths

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Config-driven path-template parameter plugin — the Spark shape of the
  * reference's `PathFormatterPlugin` SPI (path/PathFormatterPlugin.kt:47-105,
  * registry `toPathFormatterPlugin` :16-45).
  *
  * The reference resolves plugin parameters with a per-record suspend lookup
  * backed by a 10-minute REST cache. In a distributed plan a per-record
  * driver call is the one shape that cannot scale, so the contract here is:
  * [[enrich]] broadcast-joins whatever dimension data the plugin needs onto
  * the record frame ONCE per batch (the batch is bounded, the dimension
  * table is small by definition — same freshness as a 10-min cache), and
  * [[param]] resolves `${name:contents}` to a Column over the enriched
  * frame. Enrichment columns are plugin-internal (`__`-prefixed) and never
  * reach the output projection, which selects data columns by schema.
  */
trait PathFormatterPlugin {

  /** Parameter prefix: `${<name>:...}` routes to this plugin. */
  def name: String

  /** Broadcast-join the plugin's dimension data onto the record frame
    * (left joins only — must not drop or duplicate records).
    */
  def enrich(records: DataFrame): DataFrame

  /** Column for `${name:contents}`, evaluated against the enriched frame;
    * None if `contents` is not a parameter this plugin provides.
    */
  def param(contents: String): Option[Column]
}

/** Driver-side fetch hook for the ManagementPortal dimension tables the
  * `mp:` plugin joins (reference MPPathFormatterPlugin.kt:30-157 fetches
  * them per-record through MPClient with a 10-minute cache; here they are
  * fetched once per batch as small DataFrames and broadcast).
  */
trait MpDimensionSource {
  /** Project dimension: `id, organization, attributes map<string,string>`. */
  def projects(spark: SparkSession): DataFrame
  /** Subject dimension: `projectId, id, group, externalId,
    * attributes map<string,string>`.
    */
  def subjects(spark: SparkSession): DataFrame
}

object MpDimensionSource {
  /** REST-backed source (reference: managementPortalUrl +
    * managementPortalClientId/Secret, MPPathFormatterPlugin.kt:66-81 and
    * the MPClient it builds): an OAuth2 client-credentials token from
    * `<url>/oauth/token` (HTTP Basic, form-encoded grant), then paginated
    * `GET /api/projects` and `GET /api/projects/{id}/subjects` — all on
    * JDK `java.net.http`, no added dependencies. Pages are cached for 10
    * minutes (the reference's CachedMap refreshDuration) and parsed INTO
    * DataFrames by Spark's own JSON reader, so the driver never needs a
    * JSON library (the one driver-side extraction, the access token, is a
    * single well-known field).
    */
  final class Rest(properties: Map[String, String],
      pageSize: Int = 100,
      refreshMs: Long = 10 * 60 * 1000L) extends MpDimensionSource {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}

    val url: String = properties.getOrElse("managementPortalUrl",
      throw new IllegalArgumentException("Missing managementPortalUrl configuration")).stripSuffix("/")
    val clientId: Option[String] = properties.get("managementPortalClientId")
      .orElse(sys.env.get("MANAGEMENT_PORTAL_CLIENT_ID"))
    val clientSecret: Option[String] = properties.get("managementPortalClientSecret")
      .orElse(sys.env.get("MANAGEMENT_PORTAL_CLIENT_SECRET"))

    private lazy val http = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

    // one fetch epoch: project pages + per-project subject pages, refreshed
    // together after refreshMs (reference: 10-minute CachedMap)
    private case class Epoch(at: Long, projectPages: Seq[String],
        subjectPages: Map[String, Seq[String]])
    @volatile private var epoch: Option[Epoch] = None

    private def fetchToken(): String = {
      val id = clientId.getOrElse(throw new IllegalArgumentException(
        "Missing managementPortalClientId (property or MANAGEMENT_PORTAL_CLIENT_ID)"))
      val secret = clientSecret.getOrElse(throw new IllegalArgumentException(
        "Missing managementPortalClientSecret (property or MANAGEMENT_PORTAL_CLIENT_SECRET)"))
      val basic = java.util.Base64.getEncoder
        .encodeToString(s"$id:$secret".getBytes("UTF-8"))
      val req = HttpRequest.newBuilder(java.net.URI.create(s"$url/oauth/token"))
        .header("Authorization", s"Basic $basic")
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString("grant_type=client_credentials"))
        .build()
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() / 100 == 2,
        s"MP token request failed: HTTP ${resp.statusCode()} from $url/oauth/token")
      """"access_token"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(resp.body())
        .map(_.group(1))
        .getOrElse(throw new IllegalStateException(
          s"no access_token in token response from $url/oauth/token"))
    }

    private def get(uri: String, token: String): String = {
      val req = HttpRequest.newBuilder(java.net.URI.create(uri))
        .header("Authorization", s"Bearer $token")
        .header("Accept", "application/json")
        .GET().build()
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() / 100 == 2, s"MP request failed: HTTP ${resp.statusCode()} from $uri")
      resp.body()
    }

    /** All pages of a collection endpoint: `page=N&size=pageSize` until an
      * empty array comes back (Spring pageable semantics). A repeated body
      * also stops the loop — a server ignoring pagination returns its whole
      * payload once instead of looping forever.
      */
    private def fetchPages(base: String, token: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      val sep = if (base.contains("?")) "&" else "?"
      var page = 0
      var prev = ""
      var done = false
      while (!done) {
        val body = get(s"$base${sep}page=$page&size=$pageSize", token)
        val trimmed = body.trim
        if (trimmed.isEmpty || trimmed == "[]" || body == prev) done = true
        else { out += body; prev = body; page += 1 }
      }
      out.result()
    }

    private val projectArraySchema = ArrayType(StructType(Seq(
      StructField("projectName", StringType),
      StructField("organization",
        StructType(Seq(StructField("id", StringType), StructField("name", StringType)))),
      StructField("attributes", MapType(StringType, StringType)))))
    private val subjectArraySchema = ArrayType(StructType(Seq(
      StructField("login", StringType),
      StructField("externalId", StringType),
      StructField("group", StringType),
      StructField("attributes", MapType(StringType, StringType)))))

    private def projectFrame(spark: SparkSession, pages: Seq[String]): DataFrame = {
      import spark.implicits._
      spark.createDataset(pages).toDF("__json")
        .select(explode(from_json(col("__json"), projectArraySchema)).as("p"))
        .select(col("p.projectName").as("id"),
          coalesce(col("p.organization.id"), col("p.organization.name")).as("organization"),
          col("p.attributes").as("attributes"))
    }

    /** Fetch (or reuse ≤10-min-old) pages; subject pages are fetched per
      * project, so the project ids come from the already-fetched project
      * pages — parsed by Spark, collected (the project list is by
      * definition a small dimension table).
      */
    private def ensureFetched(spark: SparkSession): Epoch = synchronized {
      val now = System.currentTimeMillis()
      epoch match {
        case Some(e) if now - e.at < refreshMs => e
        case _ =>
          val token = fetchToken()
          val projectPages = fetchPages(s"$url/api/projects", token)
          val pids = projectFrame(spark, projectPages)
            .select(col("id")).collect().map(_.getString(0)).toSeq
          val subjectPages = pids.map { pid =>
            val enc = java.net.URLEncoder.encode(pid, "UTF-8").replace("+", "%20")
            pid -> fetchPages(s"$url/api/projects/$enc/subjects", token)
          }.toMap
          val e = Epoch(now, projectPages, subjectPages)
          epoch = Some(e)
          e
      }
    }

    def projects(spark: SparkSession): DataFrame =
      projectFrame(spark, ensureFetched(spark).projectPages)

    def subjects(spark: SparkSession): DataFrame = {
      import spark.implicits._
      val pages = ensureFetched(spark).subjectPages.toSeq
        .flatMap { case (pid, ps) => ps.map(pid -> _) }
      spark.createDataset(pages).toDF("projectId", "__json")
        .select(col("projectId"), explode(from_json(col("__json"), subjectArraySchema)).as("s"))
        .select(col("projectId"), col("s.login").as("id"), col("s.group").as("group"),
          col("s.externalId").as("externalId"), col("s.attributes").as("attributes"))
    }
  }

  /** Fixed in-memory dimension tables (tests; also useful for file-backed
    * exports of the portal data).
    */
  final class Static(projectsDf: DataFrame, subjectsDf: DataFrame) extends MpDimensionSource {
    def projects(spark: SparkSession): DataFrame = projectsDf
    def subjects(spark: SparkSession): DataFrame = subjectsDf
  }
}

/** `mp:` parameters from ManagementPortal dimension tables, param-name
  * compatible with the reference (MPPathFormatterPlugin.kt:102-118):
  * `organization`, `project`, `group`, `externalId`, `userId`/`login`/`id`,
  * `project:<project-attribute>`, `<subject-attribute>`; identical
  * `unknown-*`/`default` fallbacks and sanitization.
  */
final class MpPathFormatterPlugin(source: MpDimensionSource) extends PathFormatterPlugin {

  val name = "mp"

  private val projectStruct = StructType(Seq(
    StructField("id", StringType), StructField("organization", StringType),
    StructField("attributes", MapType(StringType, StringType))))
  private val subjectStruct = StructType(Seq(
    StructField("id", StringType), StructField("group", StringType),
    StructField("externalId", StringType),
    StructField("attributes", MapType(StringType, StringType))))

  override def enrich(records: DataFrame): DataFrame = {
    def keyField(n: String): Option[Column] =
      records.schema.fields.find(_.name.equalsIgnoreCase("key")).map(_.dataType) match {
        case Some(st: StructType) if st.fields.exists(_.name.equalsIgnoreCase(n)) =>
          Some(col(s"key.$n").cast(StringType))
        case _ => None
      }
    (keyField("projectId"), keyField("userId")) match {
      case (Some(pid), uid) =>
        val proj = broadcast(source.projects(records.sparkSession)
          .select(col("id").cast(StringType).as("__mp_pid"),
            struct(col("id").cast(StringType).as("id"),
              col("organization").cast(StringType).as("organization"),
              col("attributes").cast(MapType(StringType, StringType)).as("attributes"))
              .as("__mp_project")))
        val withProj = records.join(proj, pid === col("__mp_pid"), "left").drop("__mp_pid")
        uid match {
          case Some(u) =>
            val subj = broadcast(source.subjects(records.sparkSession)
              .select(col("projectId").cast(StringType).as("__mp_spid"),
                col("id").cast(StringType).as("__mp_suid"),
                struct(col("id").cast(StringType).as("id"),
                  col("group").cast(StringType).as("group"),
                  col("externalId").cast(StringType).as("externalId"),
                  col("attributes").cast(MapType(StringType, StringType)).as("attributes"))
                  .as("__mp_subject")))
            withProj.join(subj, pid === col("__mp_spid") && u === col("__mp_suid"), "left")
              .drop("__mp_spid", "__mp_suid")
          case None =>
            withProj.withColumn("__mp_subject", lit(null).cast(subjectStruct))
        }
      case _ =>
        // no lookup key in the record: params resolve to their defaults
        records.withColumn("__mp_project", lit(null).cast(projectStruct))
          .withColumn("__mp_subject", lit(null).cast(subjectStruct))
    }
  }

  // Always Some: the reference's MP lookup has the same catch-all (any
  // unrecognized contents is a subject-ATTRIBUTE lookup,
  // MPPathFormatterPlugin.kt:101-118 `else -> subjectProperty
  // attributes[contents]`), so "${mp:<typo>}" rendering
  // `unknown-<typo>` is reference parity, not a missed decline.
  override def param(contents: String): Option[Column] = Some(contents match {
    case "organization" =>
      PathTemplate.sanitizeId(col("__mp_project.organization"), "unknown-organization")
    case "project" =>
      PathTemplate.sanitizeId(col("__mp_project.id"), "unknown-project")
    case "group" =>
      PathTemplate.sanitizeId(col("__mp_subject.group"), "default")
    case "externalId" =>
      PathTemplate.sanitizeId(
        coalesce(col("__mp_subject.externalId"), col("__mp_subject.id")), "unknown-user")
    case "userId" | "login" | "id" =>
      PathTemplate.sanitizeId(col("__mp_subject.id"), "unknown-user")
    case p if p.startsWith("project:") =>
      PathTemplate.sanitizeId(
        element_at(col("__mp_project.attributes"), p.stripPrefix("project:")), s"unknown-$p")
    case attr =>
      PathTemplate.sanitizeId(element_at(col("__mp_subject.attributes"), attr), s"unknown-$attr")
  })
}

object PathFormatterPlugin {
  /** The reference's name → plugin registry (`toPathFormatterPlugins`,
    * path/PathFormatterPlugin.kt:8-45). `fixed`/`time`/`key`/`value` are
    * built into [[PathTemplate.compile]] (they need no enrichment), so only
    * enrichment-backed plugins are constructed here; unknown names resolve
    * by class name like the reference's `Class.forName` branch.
    */
  /** The template-prefix names `names` will provide once constructed —
    * for CONFIG-TIME validation, where plugins may not be constructible
    * yet (a class-loaded plugin's runtime config can be absent). A class
    * name resolves to its instance's `.name` when a no-arg construction
    * succeeds, else falls back to the raw class name (the deployment
    * still fails fast in [[fromNames]] with the clear error); without
    * this mapping a template spelled with the plugin's REAL prefix would
    * be rejected at validation while the class-name spelling validated
    * but could never resolve at compile time.
    */
  // Hand-off cache: config-time validation (prefixNames) constructs a
  // class-loaded plugin only to read its `.name`; the instance is parked
  // here and CONSUMED by the next fromNames for the same class, so a
  // plugin with a side-effectful constructor (connections, threads) runs
  // ONCE per startup, not once for validation plus once for real.
  // Retention is bounded to the load pass: fromNames clears the whole map
  // when its pass completes, and config validation clears it on failure —
  // otherwise parked instances (connections, threads) from validation-only
  // or rejected configs would live in this static map for the process
  // lifetime. A validation-only caller that never constructs plugins can
  // also call [[clearPrevalidated]] explicitly.
  private val prevalidated =
    new java.util.concurrent.ConcurrentHashMap[String, PathFormatterPlugin]()

  /** Drop any plugin instances parked by [[prefixNames]] that no
    * [[fromNames]] pass consumed (validation-only runs, rejected configs). */
  def clearPrevalidated(): Unit = prevalidated.clear()

  def prefixNames(names: Seq[String]): Seq[String] =
    names.flatMap {
      case "fixed" | "" => None // bare params only, no prefix form
      case n @ ("time" | "key" | "value" | "mp") => Some(n)
      case cls =>
        Option(prevalidated.get(cls)).map(p => p.name).orElse {
          try Class.forName(cls).getConstructor().newInstance() match {
            case p: PathFormatterPlugin =>
              prevalidated.put(cls, p); Some(p.name)
            case _ => Some(cls)
          } catch { case _: Exception => Some(cls) }
        }
    }

  def fromNames(
      names: Seq[String], properties: Map[String, String]): Seq[PathFormatterPlugin] =
    // the clear runs after the WHOLE pass (not per-name): mid-pass, other
    // classes' parked instances are still pending consumption
    try resolveNames(names, properties)
    finally prevalidated.clear()

  private def resolveNames(
      names: Seq[String], properties: Map[String, String]): Seq[PathFormatterPlugin] =
    names.flatMap {
      case "fixed" | "time" | "key" | "value" | "" => None // built-in
      case "mp" => Some(new MpPathFormatterPlugin(new MpDimensionSource.Rest(properties)))
      case cls if prevalidated.containsKey(cls) =>
        // consume the instance validation already built (remove, not get:
        // a later startup with changed runtime config must construct
        // fresh); if another thread consumed it between the guard and the
        // remove, fall through to a fresh construction
        Option(prevalidated.remove(cls)).orElse(resolveNames(Seq(cls), properties).headOption)
      case cls =>
        // fail fast like the reference's Class.forName branch: a typo'd
        // plugin name silently resolving to nothing would leave every
        // ${name:...} param at its 'unknown-*' fallback
        val instance =
          try Class.forName(cls).getConstructor().newInstance()
          catch {
            case e: ReflectiveOperationException => throw new IllegalArgumentException(
              s"Unknown path plugin '$cls': not a built-in plugin name and not a " +
                "loadable class with a no-arg constructor", e)
          }
        instance match {
          case p: PathFormatterPlugin => Some(p)
          case other => throw new IllegalArgumentException(
            s"Path plugin class '$cls' (${other.getClass.getName}) does not " +
              "implement graft.paths.PathFormatterPlugin")
        }
    }
}
