package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (0, "u1", "a", 1.0),
    (1, "u1", "a", 2.0),
    (2, "u1", "b", 3.0),
    (3, "u2", "a", 4.0),
    (4, "u1", "a", 5.0)).toDF("pos", "user", "kind", "v")

  test("keepLast keeps greatest pos per key") {
    val got = Dedup.keepLast(df, Seq(col("user"), col("kind")), col("pos"))
      .orderBy("pos").select("pos").as[Int].collect().toSeq
    assert(got == Seq(2, 3, 4))
  }

  test("keepFirst keeps least pos per key") {
    val got = Dedup.keepFirst(df, Seq(col("user"), col("kind")), col("pos"))
      .orderBy("pos").select("pos").as[Int].collect().toSeq
    assert(got == Seq(0, 2, 3))
  }

  test("keyColumns: distinctFields, else complement of ignoreFields, else all") {
    val d = df
    assert(Dedup.keyColumns(d, Set("user", "kind"), Set()).map(_.toString).size == 2)
    assert(Dedup.keyColumns(d, Set("nope"), Set("pos")).size == 3)   // all minus pos
    assert(Dedup.keyColumns(d, Set(), Set()).size == 4)
  }
}
