package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.jobs.FlakyLocalFileSystem

/** Streaming history commits through a MISBEHAVING store (round-15 verdict
  * task #4): the batch restructure/merge/quarantine paths got their
  * flaky-FS e2e in round 15 (`FlakyStoreE2eSpec`); this drives
  * [[StreamingNearDedup.dedupBatch]]'s parquet history commit — and its
  * compaction — through the same `flaky://` FileSystem with budget-limited
  * FALSE-reporting renames on the FileOutputCommitter's `_temporary` moves
  * (the move completes server-side, the store reports failure — the
  * S3-consistency-event class for a parquet sink).
  *
  * The contracts under test are dedupBatch's own: a failed commit THROWS
  * (never a silent half-commit), a foreachBatch-style replay of the failed
  * batch overwrites its own partition and converges, a compaction-write
  * failure after a successful commit loses NO history (consolidation
  * writes BEFORE it deletes), and the final history is semantically
  * identical to the same loop run against a well-behaved store.
  */
class StreamingFlakyE2eSpec extends SparkSpec {
  import spark.implicits._

  // disjoint token spaces per doc id → zero accidental similarity; planted
  // dups are near-copies of specific earlier docs (the soak spec's scheme)
  private def freshText(b: Int, i: Int): String =
    (0 until 12).map(j => s"t${b}_${i}_$j").mkString(" ")

  /** Batch `b`: 4 fresh docs + 1 near-dup of batch b-1's first doc (id
    * overlap-free). Every batch ≥ 1 therefore has exactly one history
    * near-dup to suppress.
    */
  private def batchDf(b: Int): DataFrame = {
    val fresh = (0 until 4).map(i => (b * 100L + i, freshText(b, i)))
    val dup =
      if (b == 0) Nil
      else Seq((b * 100L + 9, freshText(b - 1, 0) + " tail"))
    (fresh ++ dup).toDF("doc_id", "text")
  }

  private def distinctHistory(historyDir: String): Set[(Long, String)] =
    StreamingNearDedup.readHistory(spark, historyDir).fold(Set.empty[(Long, String)])(
      _.select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1))).toSet)

  test("e2e: commit + compaction failures through a false-reporting store; replays converge to the clean run") {
    FlakyLocalFileSystem.reset()
    spark.sparkContext.hadoopConfiguration.set(
      "fs.flaky.impl", classOf[FlakyLocalFileSystem].getName)
    val work = Files.createTempDirectory("graft-stream-flaky")
    val cleanDir = work.resolve("clean-history").toString
    val flakyDir = s"flaky:${work.resolve("flaky-history")}"
    val batches = 8

    // ---- reference loop on a well-behaved store
    val cleanSurvivors = (0 until batches).map { b =>
      StreamingNearDedup.dedupBatch(batchDf(b), b.toLong, cleanDir,
          epoch = "e", compactEvery = 2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }

    // ---- the same loop through the flaky store
    FlakyLocalFileSystem.mode.set("parquet-commit-false")
    try {
      val flakySurvivors = (0 until batches).map { b =>
        if (b == 2) {
          // batch 2's COMMIT hits a false-reporting committer rename: the
          // write must fail loudly (a silent half-commit would lose
          // survivors), then the foreachBatch-style replay of the SAME
          // (epoch, batchId) overwrites its own partition and succeeds
          FlakyLocalFileSystem.parquetFalseBudget.set(1)
          val failed = intercept[Throwable] {
            StreamingNearDedup.dedupBatch(batchDf(b), b.toLong, flakyDir,
              epoch = "e", compactEvery = 2)
          }
          assert(FlakyLocalFileSystem.parquetFalseReports.get() >= 1,
            s"misbehavior never fired: $failed")
          assert(FlakyLocalFileSystem.parquetFalseBudget.get() <= 0)
        }
        if (b == 4) {
          // batch 4: the COMMIT succeeds, then the COMPACTION write (it
          // fires at batchId % compactEvery == 0) hits a false rename.
          // phaseSink arms the budget only after the commit phase ends, so
          // the failure lands in the consolidation write specifically.
          val failed = intercept[Throwable] {
            StreamingNearDedup.dedupBatch(batchDf(b), b.toLong, flakyDir,
              epoch = "e", compactEvery = 2,
              phaseSink = (n, _) =>
                if (n == "commit") FlakyLocalFileSystem.parquetFalseBudget.set(1))
          }
          assert(FlakyLocalFileSystem.parquetFalseReports.get() >= 2,
            s"compaction misbehavior never fired: $failed")
          // crash safety: consolidation writes BEFORE it deletes, so no
          // history row is lost — every pre-compaction survivor is still
          // readable (duplicates from the partial consolidated partition
          // are allowed; they only re-assert the same verdicts)
          val afterCrash = distinctHistory(flakyDir)
          val expectedSoFar = (0 until 4).flatMap { i =>
            val texts = batchDf(i).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
            cleanSurvivors(i).map(id => (id, texts(id)))
          }.toSet
          assert(expectedSoFar.subsetOf(afterCrash),
            s"history lost rows after compaction crash: ${expectedSoFar -- afterCrash}")
        }
        // the (re)play — for failed batches this is the foreachBatch retry
        val out = StreamingNearDedup.dedupBatch(batchDf(b), b.toLong, flakyDir,
            epoch = "e", compactEvery = 2)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        if (b == 6) {
          // mid-soak CRASH-REPLAY: the batch committed, the "checkpoint
          // update was lost", and the batch replays — survivors identical,
          // history not doubled
          val replayed = StreamingNearDedup.dedupBatch(batchDf(b), b.toLong, flakyDir,
              epoch = "e", compactEvery = 2)
            .select("doc_id").collect().map(_.getLong(0)).toSet
          assert(replayed == out, s"crash-replay diverged: $replayed vs $out")
        }
        out
      }
      // per-batch survivors identical to the clean run
      (0 until batches).foreach { b =>
        assert(flakySurvivors(b) == cleanSurvivors(b),
          s"batch $b survivors diverged: ${flakySurvivors(b)} vs ${cleanSurvivors(b)}")
      }
      // final history semantically identical (distinct rows — the flaky
      // side may carry benign duplicates from the compaction crash window)
      assert(distinctHistory(flakyDir) == distinctHistory(cleanDir))
    } finally {
      FlakyLocalFileSystem.mode.set("off")
      org.apache.commons.io.FileUtils.deleteDirectory(work.toFile)
    }
  }
}
