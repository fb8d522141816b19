package graft.ledger

import java.io.{BufferedInputStream, DataInputStream, IOException}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Pluggable key-value persistence behind the offset ledger and the remote
  * locks — the seam the reference switches on `redis:` configuration
  * (accounting/OffsetRedisPersistence.kt:39-112 stores the ledger JSON
  * under its path key; accounting/RedisRemoteLockManager.kt:18-44 locks
  * with `SET key uuid NX PX <24h>`). The filesystem remains the default
  * backend; [[RespLedgerStore]] speaks the Redis protocol so a deployment
  * can share ledger state and locks with an existing reference install.
  */
trait LedgerStore extends AutoCloseable {
  def get(key: String): Option[String]
  def set(key: String, value: String): Unit
  /** `SET key value NX PX ttlMs` — true iff the key was newly set. */
  def setNxPx(key: String, value: String, ttlMs: Long): Boolean
  def del(key: String): Unit
  override def close(): Unit = ()
}

/** A RESP `-ERR ...` reply: the CONNECTION is healthy, the server refused
  * the command (READONLY during failover, OOM, wrong type). Distinct from
  * IOException so the client's reconnect-and-resend path never re-issues a
  * command the server actively rejected.
  */
final class RespErrorException(msg: String) extends RuntimeException(msg)

/** Minimal RESP2 client on a JDK socket (GET / SET [NX PX] / DEL are the
  * only commands the ledger and lock schemas need — no client dependency).
  * One connection, synchronized commands, one transparent reconnect per
  * command on a broken socket — except `SET NX` (see [[setNxPx]]): the
  * non-idempotent acquire resolves a lost reply by reading the key back
  * instead of blindly resending.
  */
final class RespLedgerStore(host: String, port: Int) extends LedgerStore {

  private var socket: Socket = _
  private var in: DataInputStream = _
  private var out: java.io.OutputStream = _

  private def connect(): Unit = {
    socket = new Socket(host, port)
    socket.setSoTimeout(30000)
    in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
    out = new java.io.BufferedOutputStream(socket.getOutputStream)
  }

  private def sendCommand(args: Seq[String]): Unit = {
    out.write(s"*${args.length}\r\n".getBytes(UTF_8))
    args.foreach { a =>
      val b = a.getBytes(UTF_8)
      out.write(s"$$${b.length}\r\n".getBytes(UTF_8))
      out.write(b)
      out.write("\r\n".getBytes(UTF_8))
    }
    out.flush()
  }

  private def readLine(): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new IOException("RESP stream closed")
      sb.append(c.toChar)
      c = in.read()
    }
    require(in.read() == '\n', "malformed RESP line terminator")
    sb.toString
  }

  /** One reply: Right(bulk-or-simple value, present?) or Left(integer). */
  private def readReply(): Either[Long, Option[String]] = {
    val line = readLine()
    line.charAt(0) match {
      case '+' => Right(Some(line.substring(1)))
      case '-' => throw new RespErrorException(s"RESP error reply: ${line.substring(1)}")
      case ':' => Left(line.substring(1).toLong)
      case '$' =>
        val n = line.substring(1).toInt
        if (n < 0) Right(None)
        else {
          val buf = new Array[Byte](n)
          in.readFully(buf)
          require(in.read() == '\r' && in.read() == '\n', "malformed RESP bulk terminator")
          Right(Some(new String(buf, UTF_8)))
        }
      case c => throw new IOException(s"unsupported RESP reply type '$c'")
    }
  }

  private def command(args: String*): Either[Long, Option[String]] = synchronized {
    if (socket == null || socket.isClosed) connect()
    try { sendCommand(args); readReply() }
    catch {
      case _: IOException =>
        // one reconnect: service loops outlive idle-timeout'd connections
        try socket.close() catch { case _: Exception => }
        connect()
        sendCommand(args)
        readReply()
    }
  }

  override def get(key: String): Option[String] =
    command("GET", key).getOrElse(None)

  override def set(key: String, value: String): Unit =
    command("SET", key, value)

  override def setNxPx(key: String, value: String, ttlMs: Long): Boolean = synchronized {
    // nil reply = not set (already held); +OK = acquired. NOT routed
    // through command(): SET NX is non-idempotent — if the reply is lost
    // (socket timeout after the server applied the SET), blindly resending
    // returns nil for OUR OWN lock and the caller walks away from a key it
    // holds until the 24 h TTL expires. Resolve a connection failure by
    // reading the key back: our value ⇒ the first SET landed.
    def attempt(): Boolean = {
      sendCommand(Seq("SET", key, value, "NX", "PX", ttlMs.toString))
      readReply().exists(_.isDefined)
    }
    if (socket == null || socket.isClosed) connect()
    try attempt()
    catch {
      case _: IOException =>
        try socket.close() catch { case _: Exception => }
        connect()
        sendCommand(Seq("GET", key))
        readReply() match {
          case Right(Some(v)) => v == value // ours ⇒ acquired by the lost reply
          case _ => attempt() // key absent: the first SET never applied
        }
    }
  }

  override def del(key: String): Unit =
    command("DEL", key)

  override def close(): Unit = synchronized {
    if (socket != null) try socket.close() catch { case _: Exception => }
  }
}

object RespLedgerStore {
  /** `redis://host[:port]` (reference RedisConfig default
    * `redis://localhost:6379`).
    */
  def fromUri(uri: String): RespLedgerStore = {
    val u = java.net.URI.create(uri)
    require(u.getScheme == "redis", s"unsupported ledger store URI scheme: $uri")
    new RespLedgerStore(
      Option(u.getHost).getOrElse("localhost"),
      if (u.getPort > 0) u.getPort else 6379)
  }
}
