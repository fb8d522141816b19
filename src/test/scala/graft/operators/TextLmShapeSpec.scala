package graft.operators

import graft.SparkSpec

/** Shape-equivalence of the [[TextLm.FreqAttach]] knob: the Window
  * (default), Join (SMJ, skew-splittable), and BroadcastVocab attach
  * shapes are three physical plans for the SAME logical result — every
  * entry point must produce identical rows under all three on the bench
  * corpus, or the crossover rule in TextLm's scaladoc would be advertising
  * a silent semantics change rather than a performance trade.
  */
class TextLmShapeSpec extends SparkSpec {
  import TextLm.FreqAttach

  private lazy val docs = graft.Tables.load(spark, sf, "documents")

  private val shapes =
    Seq(FreqAttach.Window, FreqAttach.Join, FreqAttach.BroadcastVocab)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("tfidfTopK: all three freq-attach shapes produce identical rows") {
    val byShape = shapes.map(s =>
      s -> rows(TextLm.tfidfTopK(docs, "doc_id", "text", k = 3, shape = s)))
    assert(byShape.head._2.nonEmpty, "empty tfidf result")
    byShape.tail.foreach { case (s, r) =>
      assert(r == byShape.head._2, s"tfidfTopK shape $s diverged from Window")
    }
  }

  test("unigramBucketScore: all three freq-attach shapes produce identical rows") {
    val byShape = shapes.map(s =>
      s -> rows(TextLm.unigramBucketScore(docs, "doc_id", "text", shape = s)))
    assert(byShape.head._2.nonEmpty, "empty unigram result")
    byShape.tail.foreach { case (s, r) =>
      assert(r == byShape.head._2, s"unigramBucketScore shape $s diverged from Window")
    }
  }

  test("bigramBucketScore: all three freq-attach shapes produce identical rows") {
    val byShape = shapes.map(s =>
      s -> rows(TextLm.bigramBucketScore(docs, "doc_id", "text", shape = s)))
    assert(byShape.head._2.nonEmpty, "empty bigram result")
    byShape.tail.foreach { case (s, r) =>
      assert(r == byShape.head._2, s"bigramBucketScore shape $s diverged from Window")
    }
  }
}
