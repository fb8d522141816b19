package graft.jobs

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.scalatest.funsuite.AnyFunSuite

class LockManagerSpec extends AnyFunSuite {

  private def fs: FileSystem = new HPath("/tmp").getFileSystem(new Configuration())

  test("second instance cannot acquire a held lock; release frees it") {
    val dir = Files.createTempDirectory("graft-lock").toString
    val a = new LockManager(fs, dir)
    val b = new LockManager(fs, dir)
    assert(a.tryAcquire("t"))
    assert(!b.tryAcquire("t"))
    a.release("t")
    assert(b.tryAcquire("t"))
  }

  test("expired lock is broken and re-acquired") {
    val dir = Files.createTempDirectory("graft-lock2").toString
    val stale = new LockManager(fs, dir, ttlMillis = -1000) // born expired
    val fresh = new LockManager(fs, dir)
    assert(stale.tryAcquire("t"))
    assert(fresh.tryAcquire("t"))
    // the stale owner's release must NOT free the new owner's lock
    stale.release("t")
    val other = new LockManager(fs, dir)
    assert(!other.tryAcquire("t"))
  }

  test("withLock skips when held and runs when free") {
    val dir = Files.createTempDirectory("graft-lock3").toString
    val a = new LockManager(fs, dir)
    val b = new LockManager(fs, dir)
    assert(a.tryAcquire("t"))
    assert(b.withLock("t")(42).isEmpty)
    a.release("t")
    assert(b.withLock("t")(42).contains(42))
    // released after the block: acquirable again
    assert(a.tryAcquire("t"))
  }

  test("ledger-flush lock: seconds-scale TTL wired, crashed holder breakable in seconds not a day") {
    val dir = Files.createTempDirectory("graft-lock5").toString
    val cfg = RestructureJobConfig(inputRoot = s"$dir/in", outputRoot = s"$dir/out",
      lockDir = Some(dir))
    // the manager run() actually builds for the flush lock
    val flush = Restructure.flushLockManager(None, cfg, fs)
    assert(flush.nonEmpty)
    // a holder that CRASHES inside the hold: acquire and never release
    val before = System.currentTimeMillis()
    assert(flush.get.asInstanceOf[LockManager].tryAcquire(Restructure.LedgerFlushLockName))
    // the lock file's expiry is seconds ahead — the peers' stale-break
    // window — not the 24 h topic default
    val p = new HPath(dir, s"${Restructure.LedgerFlushLockName}.lock")
    val payload = {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    val expiry = payload.trim.split('\n')(1).toLong
    assert(expiry - before <= Restructure.LedgerFlushLockTtlMs + 2000,
      s"flush lock expiry ${expiry - before} ms ahead — not seconds-scale")
    assert(expiry > before, "expiry must still be in the future at acquisition")
    // a peer cannot take it while fresh...
    val peer = Restructure.flushLockManager(None, cfg, fs).get
    assert(peer.withLock(Restructure.LedgerFlushLockName)(1).isEmpty)
    // ...but once the seconds-scale TTL has elapsed (simulated by rewinding
    // the persisted expiry by exactly the TTL), the stale-break engages and
    // the peer's flush re-serializes — within seconds of the crash
    val rewound = s"${payload.trim.split('\n')(0)}\n${before - 1}"
    val out = fs.create(p, true)
    try out.write(rewound.getBytes("UTF-8")) finally out.close()
    assert(peer.withLock(Restructure.LedgerFlushLockName)(1).contains(1))
  }

  test("restructure honours lockDir: a held topic lock skips the topic") {
    val work = Files.createTempDirectory("graft-lock4")
    // minimal avro input
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"E","fields":[
        |{"name":"key","type":{"type":"record","name":"K","fields":[
        |  {"name":"userId","type":"string"},{"name":"sourceId","type":"string"}]}},
        |{"name":"value","type":{"type":"record","name":"V","fields":[
        |  {"name":"time","type":"double"}]}}]}""".stripMargin)
    val dir = work.resolve("in/t/partition=0")
    Files.createDirectories(dir)
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, new java.io.File(dir.toFile, "t+0+0000000000+0000000001.avro"))
    (0 until 2).foreach { i =>
      val k = new org.apache.avro.generic.GenericData.Record(schema.getField("key").schema)
      k.put("userId", "u"); k.put("sourceId", "s")
      val v = new org.apache.avro.generic.GenericData.Record(schema.getField("value").schema)
      v.put("time", 1.7e9 + i)
      val r = new org.apache.avro.generic.GenericData.Record(schema)
      r.put("key", k); r.put("value", v)
      w.append(r)
    }
    w.close()
    val lockDir = work.resolve("locks").toString
    val cfg = RestructureJobConfig(
      inputRoot = work.resolve("in").toString,
      outputRoot = work.resolve("out").toString,
      lockDir = Some(lockDir))
    val external = new LockManager(fs, lockDir)
    assert(external.tryAcquire("t"))
    val spark = graft.SparkTestSession.spark
    val r1 = Restructure.run(spark, cfg)
    assert(r1.processedTopics.isEmpty, "locked topic must be skipped")
    external.release("t")
    val r2 = Restructure.run(spark, cfg)
    assert(r2.processedTopics.map(_.records).sum == 2)
  }
}
