package graft.paths

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The `mp:` REST fetch against a local ManagementPortal-shaped stub:
  * OAuth2 client-credentials token, paginated project/subject endpoints,
  * reference-shaped JSON payloads (ProjectDTO/SubjectDTO field names), the
  * 10-minute cache, and the golden `${mp:...}` path end-to-end.
  */
class MpRestSpec extends SparkSpec {

  private val tokenRequests = new AtomicInteger()
  private val apiRequests = new AtomicInteger()

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def pageOf(ex: HttpExchange): Int =
    Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&")).collectFirst {
        case kv if kv.startsWith("page=") => kv.stripPrefix("page=").toInt
      }.getOrElse(0)

  /** MP stub: /oauth/token + /api/projects + /api/projects/{id}/subjects,
    * two projects (one subject page each endpoint), empty page past the end.
    */
  private def startServer(): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/oauth/token", (ex: HttpExchange) => {
      tokenRequests.incrementAndGet()
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val expected = "Basic " + java.util.Base64.getEncoder
        .encodeToString("radar_restructure:s3cret".getBytes("UTF-8"))
      if (auth != expected) respond(ex, 401, """{"error":"invalid_client"}""")
      else if (!body.contains("grant_type=client_credentials"))
        respond(ex, 400, """{"error":"unsupported_grant_type"}""")
      else respond(ex, 200,
        """{"access_token":"tok-abc123","token_type":"bearer","expires_in":1799,"scope":"PROJECT.READ SUBJECT.READ"}""")
    })
    def requireBearer(ex: HttpExchange): Boolean =
      ex.getRequestHeaders.getFirst("Authorization") == "Bearer tok-abc123"
    server.createContext("/api/projects", (ex: HttpExchange) => {
      apiRequests.incrementAndGet()
      val path = ex.getRequestURI.getPath
      if (!requireBearer(ex)) respond(ex, 401, """{"error":"unauthorized"}""")
      else if (path == "/api/projects") {
        // one project per page probes the pagination loop
        pageOf(ex) match {
          case 0 => respond(ex, 200,
            """[{"projectName":"p1","humanReadableProjectName":"Project One",
              |"organization":{"id":"org-A","name":"Org A"},
              |"attributes":{"cohort":"c 9"},"sourceTypes":[]}]""".stripMargin)
          case 1 => respond(ex, 200,
            """[{"projectName":"p2","organization":{"name":"org-B"},"attributes":{}}]""")
          case _ => respond(ex, 200, "[]")
        }
      } else if (path == "/api/projects/p1/subjects") {
        if (pageOf(ex) == 0) respond(ex, 200,
          """[{"login":"u1","externalId":"ext-7","group":"grpX",
            |"attributes":{"site":"lab/2"},"project":{"projectName":"p1"}}]""".stripMargin)
        else respond(ex, 200, "[]")
      } else if (path == "/api/projects/p2/subjects") {
        respond(ex, 200, "[]")
      } else respond(ex, 404, """{"error":"not found"}""")
    })
    server.start()
    server
  }

  test("OAuth2 token + paginated projects/subjects -> dimension frames -> golden mp: path; cached 10 min") {
    tokenRequests.set(0); apiRequests.set(0)
    val server = startServer()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val source = new MpDimensionSource.Rest(Map(
        "managementPortalUrl" -> s"$base/", // trailing slash trimmed like the reference
        "managementPortalClientId" -> "radar_restructure",
        "managementPortalClientSecret" -> "s3cret"))

      val projects = source.projects(spark).orderBy("id").collect()
      assert(projects.map(_.getString(0)).toSeq == Seq("p1", "p2"))
      assert(projects(0).getString(1) == "org-A") // organization.id preferred
      assert(projects(1).getString(1) == "org-B") // name fallback
      assert(projects(0).getMap[String, String](2).get("cohort").contains("c 9"))

      val subjects = source.subjects(spark).collect()
      assert(subjects.length == 1)
      val s0 = subjects(0)
      assert(s0.getString(0) == "p1" && s0.getString(1) == "u1")
      assert(s0.getString(2) == "grpX" && s0.getString(3) == "ext-7")

      // one token fetch; project pages (3 requests: 2 + empty) + subject
      // pages (p1: 2, p2: 1) = 6 API requests, all within one epoch
      assert(tokenRequests.get() == 1, s"token fetched ${tokenRequests.get()} times")
      val afterFirst = apiRequests.get()
      assert(afterFirst == 6, s"expected 6 API requests, got $afterFirst")

      // second read inside the 10-minute window: served from cache
      source.projects(spark).collect()
      source.subjects(spark).collect()
      assert(tokenRequests.get() == 1 && apiRequests.get() == afterFirst,
        "cache miss within the refresh window")

      // golden ${mp:...} path end-to-end through the plugin (reference
      // param names and sanitization, MPPathFormatterPlugin.kt:102-118)
      val sql = spark
      import sql.implicits._
      val plugin = new MpPathFormatterPlugin(source)
      val records = Seq(("p1", "u1", 1.6095816e9)).toDF("projectId", "userId", "t")
        .select(struct(col("projectId"), col("userId")).as("key"), col("t"))
      val c = PathTemplate.compile(
        "${mp:organization}/${mp:project}/${mp:group}/${mp:externalId}/${mp:site}/${mp:project:cohort}",
        Map.empty, plugins = Seq(plugin))
      val got = plugin.enrich(records).select(c.as("p")).collect()(0).getString(0)
      assert(got == "org-A/p1/grpX/ext-7/lab2/c9")
    } finally server.stop(0)
  }

  test("expired cache epoch refetches; bad credentials and missing config fail actionably") {
    tokenRequests.set(0); apiRequests.set(0)
    val server = startServer()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      // refreshMs = 0: every read is a fresh epoch
      val source = new MpDimensionSource.Rest(Map(
        "managementPortalUrl" -> base,
        "managementPortalClientId" -> "radar_restructure",
        "managementPortalClientSecret" -> "s3cret"), refreshMs = 0L)
      source.projects(spark).collect()
      source.projects(spark).collect()
      assert(tokenRequests.get() == 2, "expired epoch did not refetch")

      val badSecret = new MpDimensionSource.Rest(Map(
        "managementPortalUrl" -> base,
        "managementPortalClientId" -> "radar_restructure",
        "managementPortalClientSecret" -> "wrong"))
      val denied = intercept[IllegalArgumentException] { badSecret.projects(spark) }
      assert(denied.getMessage.contains("401"))

      val noCreds = new MpDimensionSource.Rest(Map("managementPortalUrl" -> base))
      if (sys.env.contains("MANAGEMENT_PORTAL_CLIENT_ID")) cancel("env creds set")
      val missing = intercept[IllegalArgumentException] { noCreds.projects(spark) }
      assert(missing.getMessage.contains("managementPortalClientId"))
    } finally server.stop(0)
  }
}
