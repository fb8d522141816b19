package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits: x at even positions, y at odd") {
    val d = Seq((3L, 1L), (0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFFL, 0L))
      .toDF("x", "y")
    val got = d.select(ZOrder.zValue2(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x=3 (bits 0,1 → pos 0,2) + y=1 (bit 0 → pos 1) = 0b111 = 7
    assert(got(0) == 7L)
    assert(got(1) == 0L)
    assert(got(2) == 1L) // x bit 0 → pos 0
    assert(got(3) == 2L) // y bit 0 → pos 1
    // x-only bits spread to even positions: Σ 4^i for i in 0..19
    assert(got(4) == (0 until 20).map(i => 1L << (2 * i)).sum)
  }

  test("zValue2 ordering clusters both dimensions (locality sanity)") {
    // points on a 4x4 grid sorted by z-value: each consecutive pair differs
    // by a bounded L1 step on average — we just pin the full Morton order
    val pts = for (x <- 0L until 4L; y <- 0L until 4L) yield (x, y)
    val z = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue2(col("x"), col("y"), bits = 2).as("z"))
      .orderBy("z").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(z.take(4) == Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L))) // first quadrant block
    assert(z.toSet == pts.toSet)
  }
}
