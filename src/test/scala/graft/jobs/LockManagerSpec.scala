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
