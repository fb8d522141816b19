package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Determinism: all reductions are strict left folds over the vector in
  * index order, in double precision — the same fold the DuckDB oracle
  * performs — so similarity values are bit-identical across engines and the
  * derived rankings agree exactly.
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * scans the corpus once — no shuffle until the final per-query top-k
  * (window over `k·|queries|` rows). The IVF path shuffles once on cell id
  * (tiny keyspace) and prunes the scan to one cell per query.
  */
object Similarity {

  private def d(arr: Column): Column = transform(arr, x => x.cast(DoubleType))

  /** Strict sequential left fold: sum of elementwise products. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Exact top-k cosine neighbors of each query vector (brute force — the
    * correctness baseline). Output: (query_id, rank, neighbor_id).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("__sim", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("__sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** IVF assignment: nearest centroid id per vector (L2), ties broken by
    * centroid id. Centroids are a small broadcast table (id, vector).
    */
  def ivfAssign(
      vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = centroids.select(col(idCol).as("__cent_id"), col(vecCol).as("__cent_v"))
    val scored = vectors.join(broadcast(c))
      .withColumn("__dist", l2sq(col(vecCol), col("__cent_v")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__dist").asc, col("__cent_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__dist", "__cent_v")
      .withColumnRenamed("__cent_id", "cell")
  }

  /** IVF-pruned top-k: search only the query's own cell. Same output shape
    * as [[bruteForceTopK]] (approximate: recall < 1 at cell boundaries).
    */
  def ivfTopK(
      assigned: DataFrame, queryIds: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = assigned.join(queryIds, Seq(idCol), "left_semi")
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"), col("cell"))
    val c = assigned.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__sim", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("__sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }
}
