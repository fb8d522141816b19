package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("rollingHash matches direct computation and is shift-sensitive") {
    GraftExpressions.register(spark)
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 257 + (b & 0xff)) % 1000000007L)
    val got = Seq("hello world", "hello worle", "")
      .toDF("t").select(GraftExpressions.rollingHash(col("t"))).collect().map(_.getLong(0))
    assert(got(0) == ref("hello world"))
    assert(got(1) == ref("hello worle"))
    assert(got(0) != got(1))
    assert(got(2) == 0L)
  }

  test("simhash: near-identical docs closer in hamming than unrelated docs") {
    GraftExpressions.register(spark)
    val docs = Seq(
      ("a", "the quick brown fox jumps over the lazy dog again and again today"),
      ("b", "the quick brown fox jumps over the lazy dog again and again tonight"),
      ("c", "completely different content about spark catalyst optimizer internals"))
      .toDF("id", "text")
    val sh = docs.select(col("id"),
      GraftExpressions.simHash64(TextFunctions.words(col("text"))).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh("a"), sh("b")) < ham(sh("a"), sh("c")))
  }

  test("GraftSparkExtensions injects functions usable from plain SQL") {
    import org.apache.spark.sql.SparkSession
    // build a sibling session on the SAME SparkContext so the extension
    // applies at session construction (getOrCreate returns the suite
    // session otherwise); never stop it — that would kill the shared
    // context for every remaining suite in the JVM. withExtensions is the
    // in-JVM equivalent of spark.sql.extensions (a static conf, frozen
    // once the context exists) and exercises the same injection path.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftSparkExtensions())
        .getOrCreate()
      val r = s2.sql(
        "SELECT graft_rolling_hash('abc') AS rh, graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect()(0)
      def ref(str: String): Long =
        str.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 257 + (b & 0xff)) % 1000000007L)
      assert(r.getLong(0) == ref("abc"))
      assert(r.getDouble(1) == 11.0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("hammingDist64 column matches bitCount") {
    GraftExpressions.register(spark)
    val got = Seq((0xffL, 0x0fL)).toDF("a", "b")
      .select(GraftExpressions.hammingDist64(col("a"), col("b"))).collect()(0).getInt(0)
    assert(got == 4)
  }
}
