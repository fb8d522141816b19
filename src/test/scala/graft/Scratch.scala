package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main (not part of the library): times a subset of
  * SparkEntry queries with the same warm+measure protocol as Bench, or the
  * restructure job repeatedly (`restructure` arg) to isolate first-run
  * codegen/JIT cost from steady-state throughput.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("restructure")) { profileRestructure(spark, sfDir); spark.stop(); return }
    if (args.headOption.contains("stress")) {
      profileRestructure(spark, sfDir, replicate = args.lift(1).map(_.toInt).getOrElse(10))
      spark.stop(); return
    }
    if (args.headOption.contains("minhash")) { profileMinhash(spark, sfDir); spark.stop(); return }
    if (args.headOption.contains("toporders")) {
      profileTopOrders(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(10))
      spark.stop(); return
    }
    if (args.headOption.contains("ccbroadcast")) {
      profileCcBroadcast(spark, args.lift(1).map(_.toInt).getOrElse(1000000))
      spark.stop(); return
    }
    if (args.headOption.contains("incremental")) {
      profileIncremental(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      spark.stop(); return
    }
    if (args.headOption.contains("bloom")) {
      profileBloom(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(1))
      spark.stop(); return
    }
    if (args.headOption.contains("heavy")) {
      profileHeavy(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(10))
      spark.stop(); return
    }
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // SCRATCH_REPLICATE=10: run the named queries against the same
    // workload-honest replicated corpus the bench's sf1x10 section uses
    val rep = sys.env.getOrElse("SCRATCH_REPLICATE", "1").toInt
    val dir =
      if (rep <= 1) sfDir
      else BenchSupport.replicateCorpus(spark, sfDir, rep, "graft-scratch-rep",
        withTpch = true).toString
    try profileQueries(spark, dir, names)
    finally if (dir != sfDir)
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      catch { case _: Throwable => }
    spark.stop()
  }

  private def profileQueries(spark: SparkSession, sfDir: String, names: Seq[String]): Unit = {
    if (sys.env.get("SCRATCH_EXPLAIN").contains("1")) names.foreach { name =>
      println(s"==== $name ====")
      println(SparkEntry.queries(name)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    if (sys.env.get("SCRATCH_EXPLAIN_EXEC").contains("1")) names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      println(s"==== $name (executed) ====")
      println(df.queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .split("== Initial Plan ==").head)
    }
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => println(s"WARM FAIL $name: $e") }
    }
    val clear = sys.env.get("SCRATCH_CLEAR_CACHE").contains("1")
    val jobWall = new java.util.concurrent.atomic.AtomicLong()
    val jobStartT = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val nJobs = new java.util.concurrent.atomic.AtomicInteger()
    val jobDesc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobStartT.put(js.jobId, System.nanoTime())
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobDesc.put(js.jobId, d)
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStartT.remove(je.jobId)).foreach { t0 =>
          val d = System.nanoTime() - t0
          jobWall.addAndGet(d)
          if (sys.env.get("SCRATCH_JOB_DETAIL").contains("1"))
            println(f"    job ${je.jobId}%3d ${d / 1e9}%7.3f s  ${Option(jobDesc.remove(je.jobId)).getOrElse("")}")
        }
        nJobs.incrementAndGet()
      }
    })
    // SCRATCH_NOOP=1: time under the noop SINK (guide §1.4 — eager
    // materialization of every output column) instead of count(), the same
    // action the bench's queries_noop series measures. SCRATCH_PASSES=n
    // repeats the measured action (min reported alongside each pass).
    val noop = sys.env.get("SCRATCH_NOOP").contains("1")
    val passes = sys.env.get("SCRATCH_PASSES").flatMap(_.toIntOption).getOrElse(1)
    names.foreach { name =>
      val walls = (1 to passes).map { _ =>
        if (clear) spark.catalog.clearCache()
        jobWall.set(0); nJobs.set(0)
        val t0 = System.nanoTime()
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          if (noop) df.write.format("noop").mode("overwrite").save() else df.count()
        } catch { case e: Throwable => println(s"FAIL $name: $e") }
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"QUERY $name%-22s $wall%8.3f s  jobs=${nJobs.get}%3d jobWall=${jobWall.get / 1e9}%7.3f driverGap=${wall - jobWall.get / 1e9}%7.3f")
        wall
      }
      if (passes > 1) println(f"MIN   $name%-22s ${walls.min}%8.3f s")
    }
  }

  /** sf1-equivalent heavy-query sweep: the documents/embeddings tables
    * replicated ×`replicate` with disjoint id spaces (500k docs / 40k
    * vectors at sf0.1 ×10), through the heaviest operator pipelines. The
    * point is the SHAPE at scale: which stages turn from overhead-bound to
    * throughput-bound, and that nothing blows up quadratically.
    */
  private def profileHeavy(spark: SparkSession, sfDir: String, replicate: Int): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.{Similarity, TextDedup}
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"HEAVY $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs0 = Tables.load(spark, sfDir, "documents")
    val span = docs0.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
    val docs = (0 until replicate).map { i =>
      docs0.select((col("doc_id") + lit(i * span)).as("doc_id"),
        // perturb the text per replica so near-dup structure stays realistic
        // (pure copies would make every replica a duplicate cluster)
        concat(col("text"), lit(s" replica-tag-$i")).as("text"))
    }.reduce(_ unionByName _)
    docs.persist(); println(s"docs=${docs.count()} (replicate=$replicate)")
    time("minhash pairs (lazy)") {
      TextDedup.minhashCandidatePairs(docs, "doc_id", "text", 3, 12, 6, 2,
        materialize = false).count()
    }
    time("corpus dedup clusters") {
      TextDedup.corpusClusters(docs, "doc_id", "text").count()
    }
    time("repeated spans (8-token)") {
      TextDedup.repeatedSpans(docs, "doc_id", "text").count()
    }
    time("mask repeated spans") {
      TextDedup.maskRepeatedSpans(docs, "doc_id", "text").count()
    }
    time("bloom dedup (10% batch)") {
      graft.operators.Dedup.bloomDedupAgainst(
        docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0),
        "text", expectedItems = 1000000L).count()
    }
    // the SHIPPED tf/LM operators (TextLm window-attach shapes), not the
    // pre-round-13 join formulations this harness used to inline
    time("tfidf top-3 (TextLm)") {
      graft.operators.TextLm.tfidfTopK(docs, "doc_id", "text").count()
    }
    time("bigram-logprob (TextLm)") {
      graft.operators.TextLm.bigramBucketScore(docs, "doc_id", "text").count()
    }
    time("chunk-dedup shape") {
      val withWs = docs.select(col("doc_id"),
          graft.functions.TextFunctions.words(col("text")).as("__ws"))
        .withColumn("__n", size(col("__ws")).cast("long"))
        .filter(col("__n") > 0)
      val chunks = withWs
        .select(col("doc_id"), col("__ws"),
          explode(sequence(lit(0L), floor((col("__n") + 95) / 96) - 1)).as("__k"))
        .select(col("doc_id"),
          md5(concat_ws(" ", slice(col("__ws"), (col("__k") * 96 + 1).cast("int"), lit(128))))
            .as("chunk_hash"))
      val dc = chunks.groupBy(col("chunk_hash"), col("doc_id")).agg(count(lit(1)).as("__m"))
      val perHash = dc.filter(col("__m") > 0).groupBy(col("chunk_hash"))
        .agg(count(lit(1)).as("__n_docs"))
      dc.join(perHash, "chunk_hash").groupBy(col("doc_id"))
        .agg(sum(col("__m")), sum(when(col("__n_docs") > 1, col("__m")).otherwise(0L))).count()
    }
    docs.unpersist()
    val emb0 = Tables.load(spark, sfDir, "embeddings")
    val espan = emb0.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1
    val emb = (0 until replicate).map { i =>
      emb0.select((col("vec_id") + lit(i * espan)).as("vec_id"), col("embedding"))
    }.reduce(_ unionByName _)
    emb.persist(); println(s"vectors=${emb.count()}")
    val centroids = emb0.filter(col("vec_id") < 64)
    time("ivf assign + kmeans step") {
      val assigned = Similarity.ivfAssign(emb, centroids)
      val scaled = transform(col("embedding"), x => round(x.cast("double") * 1e6).cast("long"))
      assigned.groupBy(col("cell"))
        .agg(graft.functions.GraftExpressions.vectorSumLong(scaled), count(lit(1))).count()
    }
    time("embedding near-dup pairs") {
      Similarity.cosineNearDupPairs(
        Similarity.ivfAssign(emb, centroids), threshold = 0.95).count()
    }
    time("ivf probed topk (64q)") {
      Similarity.ivfTopKProbed(emb, centroids,
        emb.select(col("vec_id")).filter(col("vec_id") < 64), k = 10, nprobe = 4).count()
    }
    emb.unpersist()
  }

  /** q_bloom_dedup constant-factor attribution (round-15 verdict task #2):
    * per-stage walls for the Bloom-guarded incremental dedup — the fused
    * digest+count aggregation (the operator's one eager action), the OLD
    * two-action formulation (separate sizing count + digest build) for the
    * before/after, and the probe+verify execution — at 1× and `replicate`×.
    */
  private def profileBloom(spark: SparkSession, sfDir: String, replicate: Int): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftExpressions
    GraftExpressions.register(spark)
    val dir =
      if (replicate <= 1) sfDir
      else BenchSupport.replicateCorpus(spark, sfDir, replicate, "graft-scratch-bloom",
        withTpch = false).toString
    val fp = md5(col("text").cast(org.apache.spark.sql.types.BinaryType)).as("fp")
    def docs = Tables.load(spark, dir, "documents").select(col("doc_id"), fp)
    def history = docs.filter(col("doc_id") % 3 =!= 0)
    def batch = docs.filter(col("doc_id") % 3 === 0)
    def timed(label: String)(f: => Any): Double = {
      val runs = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"BLOOM-DECOMP $label%-34s min=${runs.min}%7.3f s  passes=${runs.map(r => f"$r%.3f").mkString(",")}")
      runs.min
    }
    // warm every shape once
    graft.operators.Dedup.bloomDedupAgainst(history, batch, "fp").count()
    val nHist = history.count()
    println(s"BLOOM-DECOMP history=$nHist batch=${batch.count()} (replicate=$replicate)")
    def numBitsFor(items: Long): Double =
      math.ceil(-items * math.log(0.03) / (math.log(2) * math.log(2)))
    timed("OLD sizing count (action 1/2)") { history.select(col("fp")).count() }
    timed("OLD digest build (action 2/2)") {
      val items = math.max(100000L, nHist)
      history.select(col("fp"))
        .agg(GraftExpressions.bloomAgg(col("fp"), items, numBitsFor(items).toLong).as("bf"))
        .head()
    }
    timed("FUSED digest+count (one pass)") {
      val cap = graft.operators.Dedup.AutoSizeCapacity
      history.select(col("fp"))
        .agg(GraftExpressions.bloomAgg(col("fp"), cap, numBitsFor(cap).toLong).as("bf"),
          count(col("fp")).as("__n"))
        .head()
    }
    val eagerSec = timed("construct (eager digest only)") {
      graft.operators.Dedup.bloomDedupAgainst(history, batch, "fp")
    }
    val fullSec = timed("full query (construct+probe+verify)") {
      graft.operators.Dedup.bloomDedupAgainst(history, batch, "fp").count()
    }
    // the probe+verify execution is the full wall minus the eager digest
    println(f"BLOOM-DECOMP probe+verify (full - eager)     ${fullSec - eagerSec}%7.3f s")
    timed("oracle-shape anti join (no bloom)") {
      batch.join(history.select(col("fp")).distinct(), Seq("fp"), "left_anti").count()
    }
    timed("anti join, no distinct build side") {
      batch.join(history.select(col("fp")), Seq("fp"), "left_anti").count()
    }
    if (dir != sfDir)
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      catch { case _: Throwable => }
  }

  /** Measures what connectedComponents' mapping broadcast actually costs
    * at its threshold row count: builds an n-row (id, rep) mapping, runs
    * the same broadcast left join, and reports the BroadcastExchange
    * dataSize/build-time metrics plus driver heap before/after.
    */
  private def profileCcBroadcast(spark: SparkSession, n: Int): Unit = {
    import org.apache.spark.sql.functions._
    val mapping = spark.range(n.toLong).select(col("id").as("__id"),
      (col("id") % 1000).as("__rep"))
    val vertices = spark.range(n.toLong * 2).select(col("id").as("vec_id"))
    def heapMb: Long = {
      System.gc()
      (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) >> 20
    }
    val before = heapMb
    val t0 = System.nanoTime()
    val joined = vertices.join(broadcast(mapping), col("vec_id") === col("__id"), "left")
      .select(coalesce(col("__rep"), col("vec_id")).as("cluster"))
    println(s"rows=${joined.count()} wall=${(System.nanoTime() - t0) / 1e9}%.2f".replace("%.2f", ""))
    val after = heapMb
    val exec = joined.queryExecution.executedPlan
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
          val m = b.metrics
          println(s"broadcast dataSize=${m.get("dataSize").map(_.value).getOrElse(-1L)} bytes " +
            s"buildTime=${m.get("buildTime").map(_.value).getOrElse(-1L)} ms " +
            s"broadcastTime=${m.get("broadcastTime").map(_.value).getOrElse(-1L)} ms " +
            s"rows=${m.get("numOutputRows").map(_.value).getOrElse(-1L)}")
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(exec)
    // authoritative dataSize: the SQL status store's accumulated metric
    // values (plan-object metrics can be stale copies under AQE)
    val store = spark.sharedState.statusStore
    store.executionsList().foreach { e =>
      val metricValues = store.executionMetrics(e.executionId)
      e.metrics.filter(m => m.name == "data size").foreach { m =>
        metricValues.get(m.accumulatorId).foreach(v =>
          println(s"statusStore dataSize: $v"))
      }
    }
    println(s"driver heap ${before}MB -> ${after}MB (delta ${after - before}MB)")
  }

  /** Incremental-probe stress at a production history:batch ratio: the
    * history side replicated ×`replicate` with disjoint id spaces (500k
    * docs / 200k vectors at sf0.1 ×100) probed by ONE original-sized batch
    * (5k docs / 2k vectors). The claims under test: history streams (no
    * corpus shuffle), the batch broadcasts once, and wall time scales
    * linearly in |history| — so runs at ×10 and ×100 should be ~10× apart.
    */
  private def profileIncremental(spark: SparkSession, sfDir: String, replicate: Int): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.{Similarity, TextDedup}
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"INCR $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs0 = Tables.load(spark, sfDir, "documents")
    val span = docs0.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
    val history = (0 until replicate).map { i =>
      docs0.select((col("doc_id") + lit(i * span)).as("doc_id"),
        concat(col("text"), lit(s" replica-tag-$i")).as("text"))
    }.reduce(_ unionByName _)
    history.persist(); println(s"history docs=${history.count()} (replicate=$replicate)")
    val batch = docs0.select(col("doc_id"), col("text"))
    (1 to 2).foreach { i =>
      time(s"minhash probe 500k:5k warm$i") {
        TextDedup.minhashCandidatePairsAgainst(
          history, batch, "doc_id", "text", 3, 12, 6, 2).count()
      }
    }
    time("minhash probe 500k:5k") {
      TextDedup.minhashCandidatePairsAgainst(
        history, batch, "doc_id", "text", 3, 12, 6, 2).count()
    }
    history.unpersist()
    val emb0 = Tables.load(spark, sfDir, "embeddings")
    val espan = emb0.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1
    val ehistory = (0 until replicate).map { i =>
      emb0.select((col("vec_id") + lit(i * espan)).as("vec_id"), col("embedding"))
    }.reduce(_ unionByName _)
    ehistory.persist(); println(s"history vectors=${ehistory.count()}")
    val ebatch = emb0.select(col("vec_id"), col("embedding"))
    (1 to 2).foreach { i =>
      time(s"cosine probe 200k:2k warm$i") {
        Similarity.cosineNearDupAgainst(ehistory, ebatch, threshold = 0.95).count()
      }
    }
    time("cosine probe 200k:2k") {
      Similarity.cosineNearDupAgainst(ehistory, ebatch, threshold = 0.95).count()
    }
    ehistory.unpersist()
  }

  /** A/B the q_top_orders join topology at `replicate`×: AQE-adaptive
    * (the landed shape — SMJ-planned exchanges materialize, then runtime
    * stats convert both joins to broadcast) vs plan-time broadcast hints
    * (no exchange ever planned — the mid-scale-optimal shape whose build
    * side is NOT bounded by contract and therefore stays unpinned).
    */
  private def profileTopOrders(spark: SparkSession, sfDir: String, replicate: Int): Unit = {
    import org.apache.spark.sql.functions._
    val dir =
      if (replicate <= 1) sfDir
      else BenchSupport.replicateCorpus(spark, sfDir, replicate, "graft-scratch-tpo",
        withTpch = true).toString
    def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
    def variant(bcast: Boolean): org.apache.spark.sql.DataFrame = {
      val cust = Tables.load(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val j1 = (if (bcast) broadcast(cust) else cust)
        .join(Tables.load(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
      val j2 = (if (bcast) broadcast(j1) else j1)
        .join(Tables.load(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      j2.groupBy(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("o_orderkey").asc)
        .limit(10)
    }
    Seq(false, true).foreach { b => variant(b).count() } // warm both shapes
    (1 to 3).foreach { _ =>
      Seq(false, true).foreach { b =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        variant(b).count()
        println(f"TOPORDERS bcast=$b%-5s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    }
    // Steady-state constant-factor ATTRIBUTION (round-14 verdict task #6):
    // component walls splitting scan vs join vs agg. Scans force column
    // materialization with sums (a bare count() short-circuits to parquet
    // row-group metadata); joins add one stage at a time on the AQE plan;
    // the prefix-subtraction gives each stage's marginal cost. min-of-2
    // per component after the warm above.
    val cores = spark.sparkContext.defaultParallelism
    def timed(label: String)(f: => Long): (String, Double, Long) = {
      val runs = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (w, n) = runs.minBy(_._1)
      println(f"TOPO-DECOMP $label%-28s $w%7.3f s  rows=$n%9d  ${n / w / cores / 1000}%8.1f krows/s/core")
      (label, w, n)
    }
    def cust = Tables.load(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    def ords = Tables.load(spark, dir, "orders")
    def li = Tables.load(spark, dir, "lineitem")
    val comps = Seq(
      timed("scan customer(filtered)") {
        cust.agg(count(col("c_custkey"))).collect()(0).getLong(0)
      },
      timed("scan orders(2 cols)") {
        ords.agg(count(col("o_custkey")), sum(col("o_orderkey").cast("double")))
          .collect()(0).getLong(0)
      },
      timed("scan lineitem(3 cols)") {
        li.agg(count(col("l_orderkey")), sum(col("l_extendedprice")),
          sum(col("l_discount"))).collect()(0).getLong(0)
      },
      timed("+join cust-orders") {
        cust.join(ords, col("c_custkey") === col("o_custkey")).count()
      },
      timed("+join lineitem") {
        cust.join(ords, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey")).count()
      },
      timed("full (agg+topN)") { variant(false).count() })
    val w = comps.map(c => c._1 -> c._2).toMap
    println(f"TOPO-MARGINAL join1=${w("+join cust-orders") - w("scan customer(filtered)") - w("scan orders(2 cols)")}%.3f s " +
      f"join2=${w("+join lineitem") - w("+join cust-orders") - w("scan lineitem(3 cols)")}%.3f s " +
      f"agg+topN=${w("full (agg+topN)") - w("+join lineitem")}%.3f s")
    // codegen/vectorization audit of the EXECUTED plan: every scan batched,
    // joins+agg inside WholeStageCodegen
    val df = variant(false); df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .split("== Initial Plan ==").head
    // formatted-mode markers: a vectorized scan surfaces as ColumnarToRow
    // feeding codegen; `* ` prefixes every whole-stage-codegen'd operator
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    val columnar = plan.linesIterator.count(_.contains("ColumnarToRow"))
    val codegen = plan.linesIterator.count(_.trim.matches("""[:+\- ]*\* .*"""))
    println(s"TOPO-PLAN scans=$scans columnar_scans=$columnar codegen_ops=$codegen")
    if (dir != sfDir)
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      catch { case _: Throwable => }
  }

  private def profileMinhash(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.TextDedup
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    docs.persist(); println("docs=" + docs.count())
    (1 to 2).foreach { _ =>
      TextDedup.minhashCandidatePairs(docs, "doc_id", "text", 3, 12, 6, 2).count()
    }
    time("full pipeline") {
      TextDedup.minhashCandidatePairs(docs, "doc_id", "text", 3, 12, 6, 2).count()
    }
    time("explode shingles") {
      docs.select(col("doc_id"), explode(TextDedup.shingles(col("text"), 3)).as("s")).count()
    }
    time("explode+3md5") {
      docs.select(col("doc_id"), explode(TextDedup.shingles(col("text"), 3)).as("__sh"))
        .select(col("doc_id") +: (0 until 3).map(s =>
          md5(concat(lit(s"$s:"), col("__sh"))).as(s"__h$s")): _*).count()
    }
    time("signatures") {
      TextDedup.minhashSignatures(docs, "doc_id", "text", 3, 12).count()
    }
    docs.unpersist()
    val raw = Tables.load(spark, sfDir, "documents")
    println("scan partitions=" + raw.rdd.getNumPartitions)
    time("full pipeline unpersisted") {
      TextDedup.minhashCandidatePairs(raw, "doc_id", "text", 3, 12, 6, 2).count()
    }
    time("full pipeline unpersisted 2") {
      TextDedup.minhashCandidatePairs(raw, "doc_id", "text", 3, 12, 6, 2).count()
    }
  }

  private def profileRestructure(spark: SparkSession, sfDir: String, replicate: Int = 1): Unit = {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files.createTempDirectory("graft-scratch-rst")
    val schemaJson =
      """{"type":"record","name":"EventRecord","fields":[
        |{"name":"key","type":{"type":"record","name":"K","fields":[
        |  {"name":"projectId","type":["null","string"],"default":null},
        |  {"name":"userId","type":"string"},{"name":"sourceId","type":"string"}]}},
        |{"name":"value","type":{"type":"record","name":"V","fields":[
        |  {"name":"time","type":"double"},{"name":"eventType","type":"string"},
        |  {"name":"value","type":"double"}]}}]}""".stripMargin
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val rows = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts").cast("double").as("tsec"))
      .collect()
    val writers = (0 until 16).map { p =>
      val dir = work.resolve(s"in/events/partition=$p")
      java.nio.file.Files.createDirectories(dir)
      val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
        new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
      w.create(schema, dir.resolve(f"events+$p+${0}%010d.avro").toFile)
      w
    }
    for (rep <- 0 until replicate; r <- rows) {
      val uid = r.getLong(1) + rep * 100000L // replicas spread over more users
      val p = (uid % 16).toInt
      val k = new org.apache.avro.generic.GenericData.Record(schema.getField("key").schema)
      k.put("projectId", "bench"); k.put("userId", s"u${uid % (64 * replicate)}"); k.put("sourceId", "s0")
      val v = new org.apache.avro.generic.GenericData.Record(schema.getField("value").schema)
      v.put("time", r.getDouble(4)); v.put("eventType", r.getString(2)); v.put("value", r.getDouble(3))
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("key", k); rec.put("value", v)
      writers(p).append(rec)
    }
    writers.foreach(_.close())
    // stage decomposition on the warm JVM: decode, dedup agg, full commit
    (1 to 2).foreach { _ =>
      val cfg0 = graft.jobs.RestructureJobConfig(
        inputRoot = work.resolve("in").toString,
        outputRoot = java.nio.file.Files.createTempDirectory("graft-scr-warm").toString,
        dedup = true, timeBinFormat = "yyyyMMdd")
      graft.jobs.Restructure.run(spark, cfg0)
    }
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val files = (0 until 16).map(p => work.resolve(s"in/events/partition=$p").toFile.listFiles()(0).toString)
    val adf = graft.sources.AvroRead.read(spark, files, None)
    time("decode only")(adf.count())
    time("decode only 2")(adf.count())
    val persisted = adf.persist(); persisted.count()
    time("decode from cache")(persisted.count())
    persisted.unpersist()
    (1 to 3).foreach { i =>
      val out = work.resolve(s"out$i")
      val cfg = graft.jobs.RestructureJobConfig(
        inputRoot = work.resolve("in").toString,
        outputRoot = out.toString,
        dedup = true, timeBinFormat = "yyyyMMdd")
      graft.util.Timer.reset(); graft.util.Timer.enabled = true
      val t0 = System.nanoTime()
      val result = graft.jobs.Restructure.run(spark, cfg)
      val sec = (System.nanoTime() - t0) / 1e9
      graft.util.Timer.enabled = false
      val n = result.processedTopics.map(_.records).sum
      println(f"RUN $i: $n records ${sec}%8.3f s  ${n / sec}%10.0f rec/s")
      println("  " + graft.util.Timer.toJson)
    }
  }
}
