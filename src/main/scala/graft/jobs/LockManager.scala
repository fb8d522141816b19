package graft.jobs

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Advisory per-topic locks between replicas: the ledger remains the
  * correctness mechanism; a broken lock can at worst duplicate work, never
  * corrupt accounting. Backends: [[LockManager]] (filesystem) and
  * [[StoreLocks]] (Redis-protocol `SET NX PX`, the reference's scheme).
  */
trait RemoteLocks {
  /** Run `f` under the lock; None if the lock is held elsewhere. */
  def withLock[T](name: String)(f: => T): Option[T]
}

/** Reference Redis lock semantics over any [[graft.ledger.LedgerStore]]
  * (accounting/RedisRemoteLockManager.kt:18-44): acquire with
  * `SET <prefix>/<name>.lock <uuid> NX PX <24h>`, release only when the
  * stored owner is still this instance's UUID.
  */
final class StoreLocks(store: graft.ledger.LedgerStore, keyPrefix: String,
    ttlMillis: Long = 24L * 3600 * 1000) extends RemoteLocks {
  private val owner = UUID.randomUUID().toString
  private def key(name: String): String = s"$keyPrefix/$name.lock"
  def withLock[T](name: String)(f: => T): Option[T] =
    if (!store.setNxPx(key(name), owner, ttlMillis)) None
    else try Some(f)
    finally if (store.get(key(name)).contains(owner)) store.del(key(name))
}

/** Per-topic advisory locks for multi-instance deployments — the semantics
  * of the reference's Redis lock (`SET NX PX <ttl>` with a UUID owner,
  * accounting/RedisRemoteLockManager.kt:18-44) on a filesystem: atomic
  * create-exclusive lock file carrying `uuid\nexpiryMillis`; a lock whose
  * expiry passed is stale and may be broken (24 h default TTL, matching the
  * reference). Correct on filesystems with atomic create-no-overwrite
  * (local, HDFS); on S3 the reference's own guidance applies — use an
  * external lock service instead.
  *
  * Locks are advisory admission control between replicas, exactly as in the
  * reference: the ledger remains the correctness mechanism; a broken lock
  * can at worst duplicate work, never corrupt accounting.
  */
final class LockManager(fs: FileSystem, lockDir: String, ttlMillis: Long = 24L * 3600 * 1000)
    extends RemoteLocks {

  private val owner = UUID.randomUUID().toString
  private val dir = new HPath(lockDir)

  private def lockPath(name: String): HPath = new HPath(dir, s"$name.lock")

  /** Try to acquire `name`; true iff this instance now holds it.
    *
    * Stale-break caveat: unlike Redis SET NX PX, delete+create is not
    * atomic, so two instances breaking the SAME expired lock can race and
    * both believe they hold it (the loser's later release is owner-checked
    * and leaves the winner's file intact). The window exists only after a
    * holder crashed AND its 24 h TTL elapsed; the consequence is duplicate
    * work for one topic iteration, never ledger corruption.
    */
  def tryAcquire(name: String): Boolean = {
    fs.mkdirs(dir)
    val p = lockPath(name)
    def createExclusive(): Boolean =
      try {
        val payload = s"$owner\n${System.currentTimeMillis() + ttlMillis}"
          .getBytes(StandardCharsets.UTF_8)
        if (fs.getScheme == "file") {
          // Hadoop's local create(path, overwrite=false) is CHECK-then-act
          // (exists() + plain O_CREAT|O_TRUNC open) — two replicas racing
          // the same lock can BOTH pass the check and both believe they
          // hold it. O_EXCL via nio is the actual atomic primitive here.
          // (HDFS/ABFS create-no-overwrite is atomic server-side and keeps
          // the Hadoop path below.)
          val nio = java.nio.file.Paths.get(p.toUri.getPath)
          val out = java.nio.file.Files.newOutputStream(nio,
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          try out.write(payload) finally out.close()
        } else {
          val out = fs.create(p, false) // atomic create-no-overwrite
          try out.write(payload) finally out.close()
        }
        true
      } catch { case _: java.io.IOException => false }
    if (createExclusive()) return true
    // existing lock: stale (past expiry) → break and retry once
    readLock(p) match {
      case Some((_, expiry)) if System.currentTimeMillis() > expiry =>
        try fs.delete(p, false) catch { case _: java.io.IOException => }
        createExclusive()
      case None => createExclusive() // unreadable/vanished: retry once
      case _ => false
    }
  }

  /** Release `name` iff held by this instance. */
  def release(name: String): Unit = {
    val p = lockPath(name)
    readLock(p) match {
      case Some((o, _)) if o == owner =>
        try fs.delete(p, false) catch { case _: java.io.IOException => }
      case _ => () // not ours (expired + re-acquired elsewhere): leave it
    }
  }

  /** Run `f` under the lock; None if the lock is held elsewhere. */
  def withLock[T](name: String)(f: => T): Option[T] =
    if (!tryAcquire(name)) None
    else try Some(f) finally release(name)

  private def readLock(p: HPath): Option[(String, Long)] =
    try {
      val in = fs.open(p)
      try {
        val bytes = in.readAllBytes()
        val parts = new String(bytes, StandardCharsets.UTF_8).trim.split('\n')
        if (parts.length >= 2) Some((parts(0), parts(1).toLong)) else None
      } finally in.close()
    } catch { case _: Exception => None }
}
