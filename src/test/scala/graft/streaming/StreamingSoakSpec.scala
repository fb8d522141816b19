package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Long-run soak of the cross-batch near-dedup history: 50 micro-batches
  * through [[StreamingNearDedup.dedupBatch]] with periodic compaction,
  * asserting the history partition/file count stays BOUNDED (without
  * compaction it grows one dir + O(shuffle partitions) files per batch,
  * forever), that deduplication against compacted history still works
  * (survivors folded into a consolidated partition keep suppressing their
  * duplicates), and that per-batch latency does not trend upward.
  */
class StreamingSoakSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(dir: java.nio.file.Path): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    walk(dir.toFile)
  }

  test("50-batch soak: bounded history partitions/files, dedup across compaction, stable latency") {
    val work = Files.createTempDirectory("graft-soak")
    val historyDir = work.resolve("history").toString
    // disjoint token spaces per doc -> zero accidental similarity; dups are
    // exact text copies of specific earlier docs
    def text(b: Int, i: Int): String =
      (0 until 12).map(j => s"t${b}_${i}_$j").mkString(" ")
    val batches = 50
    val docsPerBatch = 6
    val wall = scala.collection.mutable.ArrayBuffer.empty[Double]
    var survivorTotal = 0L
    (0 until batches).foreach { b =>
      val fresh = (0 until docsPerBatch).map(i => (b * 100L + i, text(b, i)))
      // from batch 2 on, one duplicate of a doc ~20 batches back (deep in
      // consolidated history once compaction has run) and one of the
      // previous batch (in a fresh partition)
      val dups =
        if (b < 2) Nil
        else {
          val deep = math.max(0, b - 20)
          Seq((b * 100L + 90L, text(deep, 0)), (b * 100L + 91L, text(b - 1, 1)))
        }
      val df = (fresh ++ dups).toDF("doc_id", "text")
      val t0 = System.nanoTime()
      val survivors = StreamingNearDedup.dedupBatch(df, b.toLong, historyDir,
        epoch = "soak", compactEvery = 8)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      wall += (System.nanoTime() - t0) / 1e6
      // every duplicate (deep-history or recent) must be suppressed and
      // every fresh doc kept
      assert(survivors == fresh.map(_._1).toSet,
        s"batch $b survivors diverged: $survivors")
      survivorTotal += survivors.size
    }
    // bounded layout: last compaction ran at batch 48 (absorbed ids <= 46
    // plus all earlier consolidations) -> consolidated + the replay tail
    val partDirs = new java.io.File(historyDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName).toSeq
    assert(partDirs.size <= 6, s"history partitions unbounded: $partDirs")
    assert(partDirs.exists(_.startsWith("batch=soak-c")), s"no consolidated partition in $partDirs")
    val files = dataFiles(java.nio.file.Paths.get(historyDir))
    assert(files.size <= 40, s"history file count unbounded: ${files.size}")
    // nothing lost: history holds every survivor ever emitted
    val historyCount = StreamingNearDedup.readHistory(spark, historyDir).get.count()
    assert(historyCount == survivorTotal, s"history $historyCount != survivors $survivorTotal")
    // latency stays flat-ish: the probe scans bounded files, so late batches
    // must not trend above early ones beyond host noise (generous bound)
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val early = median(wall.slice(2, 12).toSeq)
    val late = median(wall.takeRight(10).toSeq)
    assert(late < early * 6 + 2000,
      s"per-batch latency trending up: early median ${early}ms, late median ${late}ms")
  }

  test("50-batch EMBEDDING soak: bounded history, dedup across compaction, stable latency") {
    // mirrors the text soak through dedupEmbeddingBatch — the embedding
    // path shares compactHistory but probes with cosineNearDupAgainst;
    // one-hot vectors give exact cosine semantics (distinct docs 0.0,
    // duplicates 1.0) with zero accidental similarity
    val work = Files.createTempDirectory("graft-soak-emb")
    val historyDir = work.resolve("history").toString
    val batches = 50
    val docsPerBatch = 6
    val dim = batches * docsPerBatch + 1
    def vec(b: Int, i: Int): Array[Float] = {
      val v = new Array[Float](dim)
      v(b * docsPerBatch + i) = 1f
      v
    }
    val wall = scala.collection.mutable.ArrayBuffer.empty[Double]
    var survivorTotal = 0L
    (0 until batches).foreach { b =>
      val fresh = (0 until docsPerBatch).map(i => (b * 100L + i, vec(b, i).toSeq))
      val dups =
        if (b < 2) Nil
        else {
          val deep = math.max(0, b - 20)
          Seq((b * 100L + 90L, vec(deep, 0).toSeq), (b * 100L + 91L, vec(b - 1, 1).toSeq))
        }
      val df = (fresh ++ dups).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      val t0 = System.nanoTime()
      val survivors = StreamingNearDedup.dedupEmbeddingBatch(df, b.toLong, historyDir,
        threshold = 0.95, epoch = "soake", compactEvery = 8)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      wall += (System.nanoTime() - t0) / 1e6
      assert(survivors == fresh.map(_._1).toSet,
        s"batch $b embedding survivors diverged: $survivors")
      survivorTotal += survivors.size
    }
    val partDirs = new java.io.File(historyDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName).toSeq
    assert(partDirs.size <= 6, s"embedding history partitions unbounded: $partDirs")
    assert(partDirs.exists(_.startsWith("batch=soake-c")), s"no consolidated partition in $partDirs")
    val files = dataFiles(java.nio.file.Paths.get(historyDir))
    assert(files.size <= 40, s"embedding history file count unbounded: ${files.size}")
    val historyCount = StreamingNearDedup.readHistory(spark, historyDir).get.count()
    assert(historyCount == survivorTotal, s"history $historyCount != survivors $survivorTotal")
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val early = median(wall.slice(2, 12).toSeq)
    val late = median(wall.takeRight(10).toSeq)
    assert(late < early * 6 + 2000,
      s"embedding per-batch latency trending up: early ${early}ms, late ${late}ms")
  }

  test("50-batch soak under TTL retention + mid-soak replay: bounded layout, no expired span resurrects") {
    // the combined mode the separate compaction and replay tests each cover
    // alone: ttlBatches retention active for the WHOLE soak, plus a
    // foreachBatch crash-replay in the middle. Asserts (a) replay is
    // idempotent under TTL (history neither doubles nor loses rows),
    // (b) expired partitions stay expired — after the final retention pass
    // no partition older than the watermark exists and a duplicate of an
    // expired-era document re-enters (the documented TTL cost) while
    // in-window duplicates stay suppressed, (c) the partition/file layout
    // is bounded by the TTL window, not the batch count.
    val work = Files.createTempDirectory("graft-soak-ttl")
    val historyDir = work.resolve("history").toString
    def text(b: Int, i: Int): String =
      (0 until 12).map(j => s"s${b}_${i}_$j").mkString(" ")
    val batches = 50
    val ttl = 12L
    val compactEvery = 8
    def partExists(id: Int): Boolean =
      new java.io.File(historyDir, s"batch=soakt-$id").isDirectory
    val perBatchSurvivors = scala.collection.mutable.Map.empty[Int, Long]
    (0 until batches).foreach { b =>
      val fresh = (0 until 4).map(i => (b * 100L + i, text(b, i)))
      // recent dup: previous batch, always inside the TTL window -> suppressed.
      // deep dup: a doc 20 batches back — suppressed only while its
      // partition still exists (retention mode deletes, never consolidates,
      // so on-disk presence IS the ground truth for what can suppress).
      // Only from b=22 on, so every deep target b-20 ≥ 2 is used exactly
      // once — a repeated target's re-entered copy would suppress the next
      // repeat from a FRESH partition and break the on-disk oracle.
      val deep = b - 20
      val hasDeep = b >= 22
      val dups =
        (if (b >= 2) Seq((b * 100L + 91L, text(b - 1, 1))) else Nil) ++
        (if (hasDeep) Seq((b * 100L + 90L, text(deep, 0))) else Nil)
      val deepSuppressed = hasDeep && partExists(deep)
      val df = (fresh ++ dups).toDF("doc_id", "text")
      def runBatch() = StreamingNearDedup.dedupBatch(df, b.toLong, historyDir,
        epoch = "soakt", compactEvery = compactEvery, ttlBatches = ttl)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val survivors = runBatch()
      val expected = fresh.map(_._1).toSet ++
        (if (hasDeep && !deepSuppressed) Set(b * 100L + 90L) else Set.empty[Long])
      assert(survivors == expected,
        s"batch $b survivors $survivors != expected $expected (deepSuppressed=$deepSuppressed)")
      // mid-soak crash replay of THIS batch id: same survivors, history not
      // doubled (the batch's own partition is overwritten, not appended)
      if (b == 41) {
        val before = StreamingNearDedup.readHistory(spark, historyDir).get.count()
        val replayed = runBatch()
        assert(replayed == survivors, s"replay diverged at batch $b")
        val after = StreamingNearDedup.readHistory(spark, historyDir).get.count()
        assert(after == before, s"replay changed history count: $before -> $after")
      }
      perBatchSurvivors(b) = survivors.size.toLong
    }
    // final retention pass ran at batch 48 (upTo 46): everything older than
    // 46 - ttl = 34 is gone, nothing consolidated, foreign tails bounded
    val partDirs = new java.io.File(historyDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName).toSeq
    val ids = partDirs.map(_.stripPrefix("batch=soakt-").toLong)
    assert(ids.forall(_ >= 34L), s"expired partition resurrected: $partDirs")
    assert(partDirs.size <= ttl.toInt + compactEvery + 2, s"TTL layout unbounded: $partDirs")
    assert(!partDirs.exists(_.contains("-c")), s"retention mode must not consolidate: $partDirs")
    val files = dataFiles(java.nio.file.Paths.get(historyDir))
    assert(files.size <= partDirs.size * 2, s"files per partition unbounded: ${files.size}")
    // history holds exactly the surviving batches' rows — replay added none
    val historyCount = StreamingNearDedup.readHistory(spark, historyDir).get.count()
    val expectedCount = ids.map(id => perBatchSurvivors(id.toInt)).sum
    assert(historyCount == expectedCount, s"history $historyCount != expected $expectedCount")
  }

  test("compactHistory TTL retention mode: expires old partitions without merging, spares foreign epochs") {
    val work = Files.createTempDirectory("graft-ttl")
    val historyDir = work.resolve("history").toString
    def writePart(key: String, ids: Seq[Long]): Unit =
      ids.map(i => (i, s"text $i")).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$historyDir/batch=$key")
    writePart("e-1", Seq(1L)); writePart("e-5", Seq(5L))
    writePart("e-9", Seq(9L)); writePart("e-10", Seq(10L))
    writePart("other-1", Seq(100L)) // foreign epoch: untouched
    StreamingNearDedup.compactHistory(spark, historyDir, "e",
      upToBatchId = 9L, targetPartitions = 1, ttlBatches = 6L)
    val dirs = new java.io.File(historyDir).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).toSet
    // retention mode: id 1 < 9-6 expired; the in-window partitions stay
    // UN-consolidated (merging would make them unexpirable), foreign epoch
    // untouched
    assert(dirs == Set("batch=e-5", "batch=e-9", "batch=e-10", "batch=other-1"), s"got $dirs")
    // without TTL the same call consolidates up to the watermark
    StreamingNearDedup.compactHistory(spark, historyDir, "e",
      upToBatchId = 11L, targetPartitions = 1)
    val dirs2 = new java.io.File(historyDir).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).toSet
    assert(dirs2 == Set("batch=e-c10", "batch=other-1"), s"got $dirs2")
    val merged2 = spark.read.parquet(s"$historyDir/batch=e-c10")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(merged2 == Set(5L, 9L, 10L), s"merged2 ids: $merged2")
  }
}
