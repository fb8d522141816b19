package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Property fuzz of the [[TextLm.FreqAttach]] shape knob over random
  * corpora the fixed bench corpus can't reach — empty documents, null
  * text, single-token documents, one token dominating the corpus, whole
  * corpora of one repeated line. [[TextLmShapeSpec]] pins shape
  * equivalence on the bench corpus; this spec pins it where the edge
  * cases live: every row the default Window shape emits (or drops — null
  * and empty texts produce no collapsed rows, sub-2-token docs produce no
  * bigrams) must be emitted or dropped identically by the Join and
  * BroadcastVocab shapes, or the knob would silently change semantics
  * exactly on the malformed tail of a real corpus.
  */
class TextLmPropertySpec extends SparkSpec {
  import TextLm.FreqAttach
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "of", "the", "zz", "é")

  private def randomCorpus(rnd: scala.util.Random, nDocs: Int): DataFrame = {
    val docs = (0 until nDocs).map { i =>
      val text = rnd.nextInt(10) match {
        case 0 => null // null text: dropped by every shape
        case 1 => "" // empty: no tokens
        case 2 => "   " // whitespace only
        case 3 => vocab(rnd.nextInt(vocab.size)) // single token: no bigrams
        case 4 => "the the the the the the" // one dominating token
        case _ =>
          Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      (i.toLong, text)
    }
    docs.toDF("doc_id", "text")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] = df.collect().map(_.toSeq).toSet

  private val alts = Seq(FreqAttach.Join, FreqAttach.BroadcastVocab)

  test("property: tfidfTopK shapes agree on random corpora with edge-case documents") {
    val rnd = new scala.util.Random(1411L)
    (1 to 8).foreach { round =>
      val docs = randomCorpus(rnd, 1 + rnd.nextInt(30))
      val base = rows(TextLm.tfidfTopK(docs, "doc_id", "text", k = 2))
      alts.foreach { s =>
        assert(rows(TextLm.tfidfTopK(docs, "doc_id", "text", k = 2, shape = s)) == base,
          s"tfidf shape $s diverged on corpus #$round")
      }
    }
  }

  test("property: unigramBucketScore shapes agree on random corpora with edge-case documents") {
    val rnd = new scala.util.Random(1412L)
    (1 to 8).foreach { round =>
      val docs = randomCorpus(rnd, 1 + rnd.nextInt(30))
      val base = rows(TextLm.unigramBucketScore(docs, "doc_id", "text"))
      alts.foreach { s =>
        assert(rows(TextLm.unigramBucketScore(docs, "doc_id", "text", shape = s)) == base,
          s"unigram shape $s diverged on corpus #$round")
      }
    }
  }

  test("property: bigramBucketScore shapes agree; sub-2-token docs drop identically") {
    val rnd = new scala.util.Random(1413L)
    (1 to 8).foreach { round =>
      val docs = randomCorpus(rnd, 1 + rnd.nextInt(30))
      val base = rows(TextLm.bigramBucketScore(docs, "doc_id", "text"))
      alts.foreach { s =>
        assert(rows(TextLm.bigramBucketScore(docs, "doc_id", "text", shape = s)) == base,
          s"bigram shape $s diverged on corpus #$round")
      }
    }
  }
}
