package graft.ledger

import java.io.{BufferedInputStream, DataInputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap

import graft.SparkSpec
import graft.jobs.{Restructure, RestructureJobConfig, StoreLocks}

/** In-memory RESP (Redis protocol) stub server: GET / SET [NX PX] / DEL
  * over a ConcurrentHashMap with millisecond expiries — just enough wire
  * protocol to stand in for a real Redis in tests.
  */
final class RespStub {
  private val data = new ConcurrentHashMap[String, (String, Long)]() // value, expiresAt (0 = never)
  private val server = new ServerSocket(0, 16, java.net.InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort
  @volatile private var running = true
  @volatile var dropNextSetReply = false

  def get(key: String): Option[String] = Option(data.get(key)).collect {
    case (v, exp) if exp == 0L || exp > System.currentTimeMillis() => v
  }

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        new Thread(() => serve(sock)).start()
      } catch { case _: Exception => /* closed */ }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  private def readLine(in: DataInputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r' && c >= 0) { sb.append(c.toChar); c = in.read() }
    in.read() // \n
    sb.toString
  }

  private def serve(sock: Socket): Unit = {
    try {
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = sock.getOutputStream
      def reply(s: String): Unit = { out.write(s.getBytes(UTF_8)); out.flush() }
      var open = true
      while (open) {
        val header = readLine(in)
        if (header.isEmpty || !header.startsWith("*")) open = false
        else {
          val n = header.substring(1).toInt
          val args = (0 until n).map { _ =>
            val len = readLine(in).substring(1).toInt
            val buf = new Array[Byte](len)
            in.readFully(buf)
            in.read(); in.read() // \r\n
            new String(buf, UTF_8)
          }
          args.head.toUpperCase match {
            case "GET" => get(args(1)) match {
              case Some(v) =>
                val b = v.getBytes(UTF_8)
                out.write(s"$$${b.length}\r\n".getBytes(UTF_8)); out.write(b)
                out.write("\r\n".getBytes(UTF_8)); out.flush()
              case None => reply("$-1\r\n")
            }
            case "SET" =>
              val nx = args.exists(_.equalsIgnoreCase("NX"))
              val pxAt = args.indexWhere(_.equalsIgnoreCase("PX"))
              val expires = if (pxAt >= 0) System.currentTimeMillis() + args(pxAt + 1).toLong else 0L
              if (nx && get(args(1)).isDefined) reply("$-1\r\n")
              else {
                data.put(args(1), (args(2), expires))
                // lost-reply injection: the server APPLIED the write but
                // the client never hears back (network fault mid-reply)
                if (dropNextSetReply) { dropNextSetReply = false; open = false }
                else reply("+OK\r\n")
              }
            case "DEL" =>
              val had = if (data.remove(args(1)) != null) 1 else 0
              reply(s":$had\r\n")
            case other => reply(s"-ERR unknown command '$other'\r\n")
          }
        }
      }
    } catch { case _: Exception => () }
    finally { try sock.close() catch { case _: Exception => } }
  }

  def stop(): Unit = { running = false; try server.close() catch { case _: Exception => } }
}

/** Redis-protocol ledger/lock backend against the in-memory RESP stub:
  * store primitives, reference lock semantics (SET NX PX + owner-checked
  * release), and the end-to-end restructure path with the ledger living in
  * Redis (schema of accounting/OffsetRedisPersistence.kt:95-103).
  */
class RespStoreSpec extends SparkSpec {

  test("store primitives: set/get/del, NX, PX expiry, large values") {
    val stub = new RespStub
    val store = new RespLedgerStore("127.0.0.1", stub.port)
    try {
      assert(store.get("k").isEmpty)
      store.set("k", "v1")
      assert(store.get("k").contains("v1"))
      // values with newlines/unicode survive (bulk strings are binary-safe)
      val big = ("x" * 10000) + "\r\n\"πé\"" // bigger than one TCP segment? still fine
      store.set("big", big)
      assert(store.get("big").contains(big))
      assert(!store.setNxPx("k", "other", 60000), "NX must not overwrite")
      assert(store.get("k").contains("v1"))
      store.del("k")
      assert(store.get("k").isEmpty)
      assert(store.setNxPx("k", "mine", 50), "NX on absent key must set")
      Thread.sleep(120)
      assert(store.get("k").isEmpty, "PX expiry ignored")
    } finally { store.close(); stub.stop() }
  }

  test("setNxPx lost reply: acquire is recognized via read-back, not orphaned until TTL") {
    // the server applies SET NX but the reply is lost (connection drops):
    // a blind resend would see nil for OUR OWN key and the caller would
    // walk away from a lock it holds for the full 24 h TTL
    val stub = new RespStub
    val store = new RespLedgerStore("127.0.0.1", stub.port)
    try {
      stub.dropNextSetReply = true
      assert(store.setNxPx("lock1", "me", 60000),
        "lost-reply acquire must resolve to TRUE via read-back")
      assert(stub.get("lock1").contains("me"))
      // a rival still loses
      val rival = new RespLedgerStore("127.0.0.1", stub.port)
      try assert(!rival.setNxPx("lock1", "them", 60000)) finally rival.close()
      // and a lost reply on a key someone ELSE holds resolves to FALSE
      stub.dropNextSetReply = true
      assert(!store.setNxPx("lock1", "me2", 60000))
    } finally { store.close(); stub.stop() }
  }

  test("StoreLocks: mutual exclusion and owner-checked release (reference semantics)") {
    val stub = new RespStub
    val s1 = new RespLedgerStore("127.0.0.1", stub.port)
    val s2 = new RespLedgerStore("127.0.0.1", stub.port)
    try {
      val l1 = new StoreLocks(s1, "radar-output/lock")
      val l2 = new StoreLocks(s2, "radar-output/lock")
      val held = l1.withLock("topicA") {
        assert(l2.withLock("topicA")(fail("second holder entered")).isEmpty)
        assert(stub.get("radar-output/lock/topicA.lock").isDefined)
        l2.withLock("topicB")(42) // different topic: free
      }
      assert(held.contains(Some(42)))
      assert(stub.get("radar-output/lock/topicA.lock").isEmpty, "lock not released")
      // after release the other instance can take it
      assert(l2.withLock("topicA")(1).contains(1))
    } finally { s1.close(); s2.close(); stub.stop() }
  }

  test("restructure with redis ledger: state lives in the store, second run skips") {
    val stub = new RespStub
    try {
      val fixtures = Paths.get("/root/reference/src/integrationTest/resources")
      val f = "application_server_status/partition=1/application_server_status+1+0000000018+0000000020.avro"
      val work = Files.createTempDirectory("graft-resp")
      val in = work.resolve("in")
      Files.createDirectories(in.resolve(f).getParent)
      Files.copy(fixtures.resolve(f), in.resolve(f), StandardCopyOption.REPLACE_EXISTING)
      val cfg = RestructureJobConfig(
        inputRoot = in.toString, outputRoot = work.resolve("out").toString,
        redisUri = Some(s"redis://127.0.0.1:${stub.port}"))
      val r1 = Restructure.run(spark, cfg)
      assert(r1.processedTopics.map(_.records).sum == 3)
      // ledger JSON is in Redis (reference schema), not on the filesystem
      val stored = stub.get(cfg.ledger)
      assert(stored.exists(_.contains("\"partitions\"")), s"no ledger in store: $stored")
      assert(stored.exists(_.contains("\"topic\":\"application_server_status\"")))
      assert(!Files.exists(work.resolve("out").resolve("_ledger.json")),
        "redis-backed run must not write the FS ledger")
      // second run reads the store and extracts nothing
      val r2 = Restructure.run(spark, cfg)
      assert(r2.processedTopics.isEmpty || r2.processedTopics.forall(_.records == 0))
    } finally stub.stop()
  }
}
