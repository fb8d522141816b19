package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guards for CPU-heavy operators.
  *
  * A parquet scan's split count is bounded by file/row-group layout, and AQE
  * can only coalesce shuffle partitions — it can never subdivide an input
  * scan. A small-file corpus (one file → one split) therefore runs every
  * downstream narrow stage — shingling, hashing, vector math — on a single
  * core no matter how many executors the cluster has. The operators below
  * front-load a round-robin repartition ONLY when the scan under-fills the
  * cluster; inputs with enough natural splits (the 100 TB case) skip the
  * extra shuffle entirely.
  */
private[graft] object Scale {

  /** `df` repartitioned to the cluster's parallelism iff its current
    * partitioning would leave cores idle in downstream per-row work.
    * The shuffle moves only the raw input rows (pre-explode, pre-hash),
    * so its cost is one pass over the input — repaid many times over by
    * the parallelised CPU stage it feeds.
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
