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
      // EVERY registered function resolves through the extension (the two
      // registration paths share one list; a spark-sql/JDBC deployment
      // must not lag the driver-side registry)
      // derived from the registry itself — a hand-maintained list here
      // silently lagged it (graft_elem_counts was missing), which is the
      // exact gap this test exists to close for newly registered functions
      val viaRegister = {
        GraftExpressions.register(spark)
        GraftExpressions.sqlFunctions.map(_._1)
      }
      assert(viaRegister.size >= 17 && viaRegister.contains("graft_elem_counts"))
      viaRegister.foreach { fn =>
        assert(s2.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(fn)),
          s"$fn missing from the extension-injected session")
      }
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("ElemCounts: matches explode+groupBy counts; null elements skipped; null array empty") {
    GraftExpressions.register(spark)
    val rows = Seq(
      (1L, Some(Seq("a", "b", "a", "c", "b", "a"))),
      (2L, Some(Seq("x"))),
      (3L, Some(Seq.empty[String])),
      (4L, None),
      (5L, Some(Seq("é中", "", "é中", " tok "))))
      .toDF("id", "toks")
      .select(col("id"), col("toks").cast("array<string>").as("toks"))
    val viaKernel = rows
      .select(col("id"), explode(GraftExpressions.elemCounts(col("toks"))).as("tc"))
      .select(col("id"), col("tc.t").as("t"), col("tc.c").as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaGroupBy = rows
      .select(col("id"), explode(col("toks")).as("t"))
      .filter(col("t").isNotNull)
      .groupBy(col("id"), col("t")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaKernel == viaGroupBy)
    // first-occurrence order within a row (deterministic output contract)
    val ordered = rows.filter(col("id") === 1L)
      .select(GraftExpressions.elemCounts(col("toks")).as("tc")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    assert(ordered == Seq("a", "b", "c"))
  }

  test("graft_window_fps from SQL: md5 parity and analysis-time type/foldability check") {
    GraftExpressions.register(spark)
    // value parity with the built-in md5 over the space-joined window
    val r = spark.sql(
      "SELECT graft_window_fps(array('a','b','c'), 2, false) AS f, " +
        "array(md5('a b'), md5('b c')) AS e").collect()(0)
    assert(r.getSeq[String](0) == r.getSeq[String](1))
    // distinct folds within-row duplicates, keeps first-occurrence order
    val d = spark.sql(
      "SELECT graft_window_fps(array('x','x','x'), 2, true) AS f").collect()(0)
    assert(d.getSeq[String](0) == Seq.fill(1)(
      spark.sql("SELECT md5('x x')").collect()(0).getString(0)))
    // a non-array first argument and a non-foldable width must fail at
    // ANALYSIS with the function named, not ClassCastException at runtime
    val e1 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_window_fps('nope', 2, false)").collect())
    assert(e1.getMessage.contains("graft_window_fps"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_window_fps(array('a','b'), cast(rand()*2 AS int), false)").collect())
    assert(e2.getMessage.contains("graft_window_fps"))
    // an out-of-int-range LongType width passes the type check but must
    // fail NAMED — Number.intValue() would silently wrap 2^32+1 to width 1
    // and fingerprint every token as a "window"
    val e3 = intercept[Throwable](
      spark.sql("SELECT graft_window_fps(array('a','b'), 4294967297, false)").collect())
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + "\n" + messages(t.getCause)
    assert(messages(e3).contains("graft_window_fps"), messages(e3))
    // a typed NULL width is foldable with the right type — it must fail
    // named, not as a bare NullPointerException
    val e4 = intercept[Throwable](
      spark.sql("SELECT graft_window_fps(array('a','b'), cast(null AS int), false)").collect())
    assert(messages(e4).contains("graft_window_fps"), messages(e4))
    // same for a typed NULL distinct flag: unboxing would silently yield
    // false (distinct dropped, inflated counts downstream)
    val e5 = intercept[Throwable](
      spark.sql("SELECT graft_window_fps(array('a','b'), 2, cast(null AS boolean))").collect())
    assert(messages(e5).contains("graft_window_fps"), messages(e5))
  }

  test("graft_topk / graft_topk_payload: k = 0 is a valid no-op, k = -1 fails named") {
    GraftExpressions.register(spark)
    val r = spark.sql(
      "SELECT graft_topk(s, i, 0) AS t, graft_topk_payload(s, i, i, 0) AS p " +
        "FROM VALUES (1.0D, 1L), (2.0D, 2L) AS v(s, i)").collect()(0)
    assert(r.getSeq[Long](0).isEmpty && r.getSeq[Long](1).isEmpty)
    val e = intercept[Throwable](
      spark.sql("SELECT graft_topk(s, i, -1) FROM VALUES (1.0D, 1L) AS v(s, i)").collect())
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + "\n" + messages(t.getCause)
    assert(messages(e).contains("graft_topk"), messages(e))
  }

  test("graft_elem_counts from SQL: struct field names, counts, and analysis-time type check") {
    GraftExpressions.register(spark)
    val r = spark.sql(
      "SELECT tc.t, tc.c FROM (SELECT explode(graft_elem_counts(array('b','a','b'))) AS tc)")
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r == Seq(("b", 2L), ("a", 1L))) // first-occurrence order
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_elem_counts(42)").collect())
    assert(e.getMessage.contains("graft_elem_counts"))
  }

  test("hammingDist64 column matches bitCount") {
    GraftExpressions.register(spark)
    val got = Seq((0xffL, 0x0fL)).toDF("a", "b")
      .select(GraftExpressions.hammingDist64(col("a"), col("b"))).collect()(0).getInt(0)
    assert(got == 4)
  }

  test("TopKPayload: random workloads match brute-force under any partitioning (merge + serde)") {
    val rnd = new scala.util.Random(17) // seeded — deterministic test
    for (trial <- 1 to 4) {
      val k = 1 + rnd.nextInt(4)
      val rows = (0 until 300).map { i =>
        // duplicate scores force the tie-break path; payload carries extra data
        (s"g${i % 7}", rnd.nextInt(8).toDouble, s"tok${rnd.nextInt(50)}%03d$i", i.toLong)
      }
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.sortBy(r => (-r._2, r._3)).take(k).map(r => (r._3, r._4))
      }
      // random repartitioning exercises partial buffers, merges and the
      // UnsafeProjection-based (de)serialization between them
      val df = rows.toDF("g", "score", "tok", "payload")
        .repartition(1 + rnd.nextInt(8))
      val got = df.groupBy(col("g"))
        .agg(GraftExpressions.topKPayload(col("score"), col("tok"),
          struct(col("tok"), col("payload")), k).as("top"))
        .collect()
        .map(r => r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getString(0), p.getLong(1))))
        .toMap
      assert(got == expected, s"trial $trial (k=$k) mismatch")
    }
    // numeric tie column too (long)
    val d2 = Seq((1.0, 5L), (1.0, 3L), (1.0, 9L), (2.0, 7L)).toDF("s", "id")
    val top2 = d2.agg(GraftExpressions.topKPayload(col("s"), col("id"),
      col("id"), 2)).collect()(0).getSeq[Long](0)
    assert(top2 == Seq(7L, 3L)) // score desc, then id asc
  }

  test("TopKIds buffer: random adds/merges/serde match brute-force (primitive heap)") {
    val rnd = new scala.util.Random(23) // seeded — deterministic test
    for (trial <- 1 to 20) {
      val k = rnd.nextInt(6) // includes k=0 (keep nothing)
      val rows = (0 until 200).map { i =>
        // few distinct scores force the id tie-break; NaN and ±0.0 force
        // the Double.compare total order
        val s = rnd.nextInt(6) match {
          case 0 => Double.NaN
          case 1 => -0.0
          case 2 => 0.0
          case _ => rnd.nextInt(5).toDouble
        }
        (s, rnd.nextLong())
      }
      val expected = rows.sortWith { (a, b) =>
        val c = java.lang.Double.compare(a._1, b._1)
        c > 0 || (c == 0 && a._2 < b._2)
      }.take(k).map(_._2)
      // split into random partial buffers, serde each, merge in random order
      val parts = rows.grouped(1 + rnd.nextInt(60)).map { chunk =>
        val b = new GraftExpressions.TopKIds.Buffer(k)
        chunk.foreach { case (s, id) => b.add(s, id) }
        GraftExpressions.TopKIds.Buffer.fromBytes(b.toBytes)
      }.toSeq
      val merged = rnd.shuffle(parts).reduceLeft { (a, b) => a.addAll(b); a }
      assert(merged.idsBestFirst.toSeq == expected, s"trial $trial (k=$k)")
      // idsBestFirst must not disturb the live heap (it sorts on copies)
      assert(merged.idsBestFirst.toSeq == expected, s"trial $trial second eval")
    }
  }

  test("TopKPayload buffer: NaN admission matches heap order regardless of arrival order") {
    // NaN compares greatest under Double.compare (Spark's sort order), same
    // contract TopKIds pins: a NaN score wins a top-1 contest either way
    val cmp: (Any, Any) => Int = (a, b) =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    val b1 = new GraftExpressions.TopKPayload.Buffer(1, cmp)
    b1.add(Double.NaN, 7L, "nan"); b1.add(1.0, 8L, "one")
    val b2 = new GraftExpressions.TopKPayload.Buffer(1, cmp)
    b2.add(1.0, 8L, "one"); b2.add(Double.NaN, 7L, "nan")
    assert(b1.payloadsBestFirst.toSeq == Seq("nan"))
    assert(b2.payloadsBestFirst.toSeq == Seq("nan"))
  }

  test("AdjacentPairs: bigram pairing matches the zip_with-of-slices formulation") {
    val df = Seq(
      Seq("a", "b", "c", "d"),
      Seq("x", "y"),
      Seq("only"),
      Seq.empty[String]).toDF("ws")
    val got = df.select(GraftExpressions.adjacentPairs(col("ws")).as("bg"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(got == Seq(Seq("a b", "b c", "c d"), Seq("x y"), Seq(), Seq()))
    // equivalence with the built-in formulation on realistic text
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(graft.functions.TextFunctions.words(col("text")).as("ws"))
    val nBg = size(col("ws")) - 1
    val mismatch = docs.select(
        GraftExpressions.adjacentPairs(col("ws")).as("kernel"),
        zip_with(slice(col("ws"), lit(1), greatest(nBg, lit(0))),
          slice(col("ws"), lit(2), greatest(nBg, lit(0))),
          (a, b) => concat(a, lit(" "), b)).as("hof"))
      .filter(col("kernel") =!= col("hof")).count()
    assert(mismatch == 0L)
  }

  test("WhitespaceTokens: matches filter(split(trim)) on edge cases and the corpus") {
    val df = Seq(
      "  leading and trailing  ",
      "tabs\tand\nnewlines\r\n mixed \f ends",
      "single",
      "",
      "   ").toDF("t")
    val got = df.select(GraftExpressions.whitespaceTokens(col("t")).as("ws"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(got == Seq(
      Seq("leading", "and", "trailing"),
      Seq("tabs", "and", "newlines", "mixed", "ends"),
      Seq("single"), Seq(), Seq()))
    // RE2 parity: \v (0x0B) is NOT whitespace to DuckDB's \s (verified:
    // regexp_split_to_array('a'||chr(11)||'b', '\s+') stays one token),
    // so the kernel must not split on it either — deliberate divergence
    // from Java regex \s
    val vtab = Seq("a\u000Bb c").toDF("t")
      .select(GraftExpressions.whitespaceTokens(col("t")).as("ws"))
      .collect().head.getSeq[String](0)
    assert(vtab == Seq("a\u000Bb", "c"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val mismatch = docs.select(
        GraftExpressions.whitespaceTokens(col("text")).as("kernel"),
        filter(split(trim(col("text")), "\\s+"), w => length(w) > 0).as("hof"))
      .filter(col("kernel") =!= col("hof")).count()
    assert(mismatch == 0L)
  }

  test("CdcBoundaries: positions match the filter/md5-substring formulation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(GraftExpressions.whitespaceTokens(col("text")).as("ws"))
    val n = size(col("ws"))
    val hof = when(n >= 4,
      filter(sequence(lit(3), n - 1),
        p => substring(md5(concat_ws(" ", slice(col("ws"), p - 2, lit(4)))), 32, 1) === "0"))
      .otherwise(array().cast("array<int>"))
    val mismatch = docs.select(
        GraftExpressions.cdcBoundaries(col("ws")).as("kernel"), hof.as("hof"))
      .filter(col("kernel") =!= col("hof")).count()
    assert(mismatch == 0L)
    // short-array edge: < 4 tokens → no boundaries
    val short = Seq(Seq("a", "b", "c")).toDF("ws")
      .select(GraftExpressions.cdcBoundaries(col("ws")).as("b"))
      .collect().head.getSeq[Int](0)
    assert(short.isEmpty)
  }

  test("NGrams: shingle windows match the transform/slice formulation") {
    val df = Seq(
      Seq("a", "b", "c", "d"),
      Seq("x", "y", "z"),
      Seq("u", "v"),
      Seq.empty[String]).toDF("ws")
    val got = df.select(GraftExpressions.nGrams(col("ws"), 3).as("sh"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq("x y z"), Seq(), Seq()))
    // equivalence with the HOF formulation on realistic text (n >= size
    // rows excluded — the kernel returns empty where the HOF builds a
    // descending sequence)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(graft.functions.TextFunctions.words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
    val mismatch = docs.select(
        GraftExpressions.nGrams(col("ws"), 3).as("kernel"),
        transform(sequence(lit(0), size(col("ws")) - 3),
          i => concat_ws(" ", slice(col("ws"), i + 1, lit(3)))).as("hof"))
      .filter(col("kernel") =!= col("hof")).count()
    assert(mismatch == 0L)
  }

  test("VectorSumLong: ragged and null-element arrays sum positionally; matches explode+sum") {
    val rows = Seq(
      (0, Seq[java.lang.Long](1L, 2L, 3L)),
      (0, Seq[java.lang.Long](10L, null, 30L, 40L)), // null element counts as 0
      (1, Seq[java.lang.Long](5L)),
      (1, Seq.empty[java.lang.Long]))
    val df = rows.toDF("g", "xs").repartition(3)
    val got = df.groupBy(col("g"))
      .agg(GraftExpressions.vectorSumLong(col("xs")).as("sums"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(got(0) == Seq(11L, 2L, 33L, 40L))
    assert(got(1) == Seq(5L))
    // cross-check vs the explode+groupBy shape on dense input
    val dense = (0 until 200).map(i => (i % 5, Seq.fill(16)(i.toLong))).toDF("g", "xs")
    val viaAgg = dense.groupBy(col("g"))
      .agg(GraftExpressions.vectorSumLong(col("xs")).as("sums"))
      .select(col("g"), posexplode(col("sums")).as(Seq("dim", "s")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val viaExplode = dense.select(col("g"), posexplode(col("xs")).as(Seq("dim", "x")))
      .groupBy(col("g"), col("dim")).agg(sum(col("x")).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(viaAgg == viaExplode)
  }
}
