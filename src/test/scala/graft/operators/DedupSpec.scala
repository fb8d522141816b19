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

  test("bloomDedupAgainst: exact result at any fpp, empty history passes all, guards") {
    val history = (0L until 500L).map(i => (i, s"key-${i % 200}")).toDF("id", "k")
    val batch = (1000L until 1100L).map(i => (i, s"key-${i % 250}")).toDF("id", "k")
    // oracle: plain anti join on the key
    val expect = batch.join(history.select(col("k")).distinct(), Seq("k"), "left_anti")
      .select("id").collect().map(_.getLong(0)).toSet
    // exactness must hold across filter sizing, including a deliberately
    // tiny/saturated filter (every probe a hit → everything verified)
    for (fpp <- Seq(0.03, 0.5); items <- Seq(10L, 1000000L)) {
      val got = Dedup.bloomDedupAgainst(history, batch, "k", items, fpp)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == expect, s"fpp=$fpp items=$items")
    }
    // auto-sizing (expectedItems = 0, the default): measures the history
    // key count inside the operator — result identical to explicit sizing
    val auto = Dedup.bloomDedupAgainst(history, batch, "k")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(auto == expect)
    // empty history: the whole batch survives (null digest short-circuit)
    val none = Dedup.bloomDedupAgainst(history.filter(lit(false)), batch, "k")
    assert(none.count() == 100L)
    intercept[IllegalArgumentException] {
      Dedup.bloomDedupAgainst(history, batch, "k", expectedItems = -1L)
    }
    intercept[IllegalArgumentException] {
      Dedup.bloomDedupAgainst(history, batch, "k", fpp = 1.5)
    }
  }

  test("bloomDedupAgainst auto-sizing: exact result in every sizing branch (tiny rebuild, one-pass keep, over-capacity rebuild)") {
    // n > AutoSizeCapacity (262144) drives the over-capacity second-pass
    // rebuild — the branch only a >256k-key history reaches, previously
    // exercised solely by the 10× bench where a wrong digest would degrade
    // silently into extra verify volume instead of failing a test
    val nOver = Dedup.AutoSizeCapacity + 50000L
    val history = spark.range(nOver).select(concat(lit("key-"), col("id")).as("k"))
    val batch = spark.range(nOver - 1000, nOver + 1000)
      .select(col("id"), concat(lit("key-"), col("id")).as("k"))
    val got = Dedup.bloomDedupAgainst(history, batch, "k")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == (nOver until nOver + 1000).toSet)
    // mid-range (8k < n <= capacity): the fused one-pass digest is kept
    val midHistory = spark.range(20000).select(concat(lit("m-"), col("id")).as("k"))
    val midBatch = spark.range(19000, 21000)
      .select(col("id"), concat(lit("m-"), col("id")).as("k"))
    val gotMid = Dedup.bloomDedupAgainst(midHistory, midBatch, "k")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotMid == (20000L until 21000L).toSet)
    // tiny (n <= capacity/32): exactly-sized rebuild — covered for content
    // here and by the 500-row auto case in the spec above
    val tinyHistory = spark.range(100).select(concat(lit("t-"), col("id")).as("k"))
    val tinyBatch = spark.range(50, 150)
      .select(col("id"), concat(lit("t-"), col("id")).as("k"))
    val gotTiny = Dedup.bloomDedupAgainst(tinyHistory, tinyBatch, "k")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotTiny == (100L until 150L).toSet)
  }

  test("keyColumns: distinctFields, else complement of ignoreFields, else all") {
    val d = df
    assert(Dedup.keyColumns(d, Set("user", "kind"), Set()).map(_.toString).size == 2)
    assert(Dedup.keyColumns(d, Set("nope"), Set("pos")).size == 3)   // all minus pos
    assert(Dedup.keyColumns(d, Set(), Set()).size == 4)
  }
}
