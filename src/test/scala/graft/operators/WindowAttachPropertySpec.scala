package graft.operators

import graft.SparkSpec
import graft.functions.{GraftExpressions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Property fuzz of the round-13 join-free window attach (q_tfidf /
  * q_bigram_logprob): a corpus-wide per-key aggregate attached onto the
  * row-local (doc, key) stream by `agg(...) over (partition by key)` is
  * only equal to the groupBy(key)+join-back formulation because the
  * stream is PRE-COLLAPSED — exactly one row per (doc, key), guaranteed
  * by graft_elem_counts. This spec pins that equivalence on random
  * corpora the fixed oracle data can't reach (empty docs, single-token
  * docs, one token dominating the corpus, docs that are all duplicates
  * of one line), plus the invariant that makes it sound.
  */
class WindowAttachPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "of", "the", "zz", "é")

  private def randomCorpus(rnd: scala.util.Random, nDocs: Int): DataFrame = {
    val docs = (0 until nDocs).map { i =>
      val n = rnd.nextInt(12) // 0 => empty text
      val words = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "))
    }
    docs.toDF("doc_id", "text")
  }

  /** Row-local pre-collapsed (doc, token, tf) stream — the contract input. */
  private def tfStream(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      explode(GraftExpressions.elemCounts(TextFunctions.words(col("text")))).as("__tc"))
    .select(col("doc_id"), col("__tc.t").as("token"), col("__tc.c").as("tf"))

  private def collectSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("property: count window over token partition ≡ groupBy(token)+join-back df") {
    val rnd = new scala.util.Random(1311L)
    (1 to 12).foreach { round =>
      val tf = tfStream(randomCorpus(rnd, 1 + rnd.nextInt(40)))
      val windowed = tf.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("token"))))
      val joined = tf.join(
        tf.groupBy(col("token")).agg(count(lit(1)).as("df")), "token")
        .select(col("doc_id"), col("token"), col("tf"), col("df"))
      assert(collectSet(windowed.select(col("doc_id"), col("token"), col("tf"), col("df")))
        == collectSet(joined), s"df window ≠ join-back on corpus #$round")
    }
  }

  test("property: sum window over bigram partition ≡ groupBy(bigram)+join-back freq") {
    val rnd = new scala.util.Random(1312L)
    (1 to 12).foreach { round =>
      val db = randomCorpus(rnd, 1 + rnd.nextInt(40))
        .select(col("doc_id"), TextFunctions.words(col("text")).as("__ws"))
        .select(col("doc_id"),
          explode(GraftExpressions.elemCounts(
            GraftExpressions.adjacentPairs(col("__ws")))).as("__bc"))
        .select(col("doc_id"), col("__bc.t").as("bigram"), col("__bc.c").as("c"))
      val windowed = db.withColumn("freq",
        sum(col("c")).over(Window.partitionBy(col("bigram"))))
      val joined = db.join(
        db.groupBy(col("bigram")).agg(sum(col("c")).as("freq")), "bigram")
        .select(col("doc_id"), col("bigram"), col("c"), col("freq"))
      assert(collectSet(windowed.select(col("doc_id"), col("bigram"), col("c"), col("freq")))
        == collectSet(joined), s"freq window ≠ join-back on corpus #$round")
    }
  }

  test("soundness invariant: the elem-count stream is distinct per (doc, key)") {
    // The window attach over-counts the moment a (doc, key) pair repeats —
    // this is the precondition both equivalences above stand on, pinned on
    // the nastiest corpus for it: every doc the same heavily-repeating line.
    val docs = (0L until 20L).map(i => (i, "of the of the of of of")).toDF("doc_id", "text")
    val tf = tfStream(docs)
    assert(tf.count() == tf.select(col("doc_id"), col("token")).distinct().count())
    // and the window df on that corpus is the document count for every token
    val dfs = tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("token"))))
      .select(col("df").cast(LongType)).distinct().collect().map(_.getLong(0)).toSeq
    assert(dfs == Seq(20L), s"df must be |docs| for an every-doc token, got $dfs")
  }
}
