package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")

  test("cosine: identical vector = 1.0, orthogonal = 0.0") {
    val d = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f), Seq(-2.0f, 1.0f))).toDF("a", "b", "c")
    val r = d.select(
      Similarity.cosine(col("a"), col("b")).as("same"),
      Similarity.cosine(col("a"), col("c")).as("orth")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("bruteForceTopK: nearest first, self excluded") {
    val top = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), 2)
      .orderBy("rank").collect()
    assert(top.map(_.getLong(2)).toSeq == Seq(1L, 2L)) // 1 closest, never itself
  }

  test("ivfAssign: centroid members map to their own cell") {
    val assigned = Similarity.ivfAssign(vecs, vecs.filter(col("vec_id") < 2))
    val cells = assigned.collect().map(r =>
      r.getLong(r.fieldIndex("vec_id")) -> r.getLong(r.fieldIndex("cell"))).toMap
    assert(cells(0L) == 0L && cells(1L) == 1L)
  }
}
