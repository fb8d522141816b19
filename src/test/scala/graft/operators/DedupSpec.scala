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

  test("bloomDedupAgainst auto-sizing: exact result in every sizing branch (deep fold, shallow fold, over-capacity rebuild)") {
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
    // mid-range (20k keys): the fused capacity digest folds 2^21 -> 2^18
    // bits; the probe must stay exact through the fold
    val midHistory = spark.range(20000).select(concat(lit("m-"), col("id")).as("k"))
    val midBatch = spark.range(19000, 21000)
      .select(col("id"), concat(lit("m-"), col("id")).as("k"))
    val gotMid = Dedup.bloomDedupAgainst(midHistory, midBatch, "k")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotMid == (20000L until 21000L).toSet)
    // tiny (100 keys): the deepest fold (2^21 -> 1024 bits, a ~140-byte
    // plan literal instead of the 256 KB capacity bitmap)
    val tinyHistory = spark.range(100).select(concat(lit("t-"), col("id")).as("k"))
    val tinyBatch = spark.range(50, 150)
      .select(col("id"), concat(lit("t-"), col("id")).as("k"))
    val gotTiny = Dedup.bloomDedupAgainst(tinyHistory, tinyBatch, "k")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotTiny == (100L until 150L).toSet)
  }

  test("foldDigest: folded digest is a valid sketch filter — exact shrink, zero false negatives, sane fpp") {
    import org.apache.spark.util.sketch.BloomFilter
    // mirror the operator's tuning: 8 bits/item at build (k = 6), folded
    // to the measured cardinality's size — same bits/item ratio
    val bf = BloomFilter.create(8192, 1L << 16) // 65536 bits, 1024 words
    val keys = (0 until 1000).map(i => s"fold-key-$i")
    keys.foreach(bf.putString)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val full = bos.toByteArray
    val folded = Dedup.foldDigest(full, targetBits = 7300) // numBitsFor(1000) at 3%
    assert(folded.length < full.length / 7, s"${folded.length} vs ${full.length}")
    val f2 = BloomFilter.readFrom(new java.io.ByteArrayInputStream(folded))
    assert(f2.bitSize() == 8192, s"expected fold to 8192 bits, got ${f2.bitSize()}")
    // NO false negatives, ever (folding is bit-exact direct-build-at-B/2)
    assert(keys.forall(f2.mightContainString), "fold introduced a false negative")
    // fpp stays build-grade at the same bits/item (~3% target; allow 10%)
    val fps = (0 until 10000).count(i => f2.mightContainString(s"absent-$i"))
    assert(fps < 1000, s"folded fpp degenerated: $fps/10000")
    // no-op when another halving would dip below the target
    val same = Dedup.foldDigest(full, targetBits = 40000)
    assert(same.sameElements(full))
  }

  test("keyColumns: distinctFields, else complement of ignoreFields, else all") {
    val d = df
    assert(Dedup.keyColumns(d, Set("user", "kind"), Set()).map(_.toString).size == 2)
    assert(Dedup.keyColumns(d, Set("nope"), Set("pos")).size == 3)   // all minus pos
    assert(Dedup.keyColumns(d, Set(), Set()).size == 4)
  }
}
