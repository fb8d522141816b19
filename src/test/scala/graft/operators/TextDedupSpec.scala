package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: n-grams for long text, whole text for short") {
    val df = Seq("a b c d", "xy").toDF("text")
    val got = df.select(TextDedup.shingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("xy"))
  }

  test("identical docs always collide in minhash LSH; disjoint docs get distinct signatures") {
    val docs = Seq(
      (1L, "spark catalyst optimizer rewrites logical plans into physical plans"),
      (2L, "spark catalyst optimizer rewrites logical plans into physical plans"),
      (3L, "entirely unrelated words about cooking pasta with tomato sauce basil"))
      .toDF("doc_id", "text")
    val pairs = TextDedup.minhashCandidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("jaccardCounts: identical sets → inter == union") {
    val df = Seq(("a b c d e f", "a b c d e f"), ("a b c d e f", "q r s t u v"))
      .toDF("t1", "t2")
    val (i, u) = TextDedup.jaccardCounts(
      TextDedup.shingles(col("t1"), 3), TextDedup.shingles(col("t2"), 3))
    val rows = df.select(i.as("i"), u.as("u")).collect()
    assert(rows(0).getInt(0) == rows(0).getInt(1))
    assert(rows(1).getInt(0) == 0)
  }
}
