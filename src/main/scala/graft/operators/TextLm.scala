package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.{GraftExpressions, TextFunctions}

/** Corpus-frequency text scoring (tf-idf shortlists, unigram/bigram LM
  * bucket scores) over a pre-collapsed per-(doc, key) count stream — the
  * row-local `graft_elem_counts` kernel emits distinct (doc, token/bigram,
  * count) rows straight from the scan stage, so no shape below ever
  * shuffles the raw token OCCURRENCE stream.
  *
  * The corpus frequency can attach to that stream three ways
  * ([[TextLm.FreqAttach]]); which one wins is a function of corpus shape,
  * so the choice is a runtime knob rather than a hard-coded plan:
  *
  *  - [[FreqAttach.Window]] (default): a sum/count window keyed on the
  *    bare token — ONE exchange of the collapsed stream, no join, no
  *    second tokenizing scan. The hot-key partition ("the") holds at most
  *    one row per document — the same per-key bound a join's probe side
  *    would have — and the running sum streams it O(n). Measured best at
  *    sf0.1 and 10× for all three entry points (PLANS.md).
  *  - [[FreqAttach.Join]]: groupBy(key) + merge-join-back. Same one
  *    logical exchange of the collapsed stream plus the aggregate branch,
  *    but the sort-merge join is AQE-skew-splittable — the shape for
  *    corpora where a single hot key's per-document bound (≥10⁹ docs
  *    containing it) outgrows what one window partition should hold.
  *  - [[FreqAttach.BroadcastVocab]]: groupBy(key) is map-side-collapsed
  *    to ~|vocab| rows per input partition before its (tiny) exchange,
  *    and the result broadcasts back onto the UN-shuffled collapsed
  *    stream — the collapsed stream itself never exchanges, at the cost
  *    of computing the scan+tokenize branch twice (no exchange on the
  *    probe side for AQE to reuse). The shape for corpora where one
  *    exchange of the collapsed stream costs more than a re-tokenize AND
  *    the vocabulary is broadcast-bounded (unigrams, yes; corpus-scale
  *    bigram vocabularies grow ~linearly with the corpus — do not
  *    broadcast those).
  *
  * Selection rule, one line: Window by default; Join when one key exceeds
  * ~10⁹ documents (skew-split); BroadcastVocab when the vocabulary is
  * bounded (≲1M keys) and the collapsed stream is so wide that one
  * exchange of it exceeds a full re-tokenize. All three shapes produce
  * IDENTICAL rows (shape-equivalence is property-spec'd).
  */
object TextLm {

  /** How the corpus key frequency attaches to the collapsed (doc, key,
    * count) stream — see the class doc for the selection rule.
    */
  sealed trait FreqAttach
  object FreqAttach {
    /** Keyed window over the collapsed stream (default; one exchange, no join). */
    case object Window extends FreqAttach
    /** groupBy + sort-merge join-back (AQE-skew-splittable). */
    case object Join extends FreqAttach
    /** groupBy + broadcast join-back (collapsed stream never exchanges;
      * tokenizes twice; vocabulary must be broadcast-bounded). */
    case object BroadcastVocab extends FreqAttach
  }

  /** Row-local per-(doc, token) counts: one scan, no occurrence-stream
    * exchange (`graft_elem_counts` collapses within the scan-stage
    * projection). Columns: (idCol, token, c).
    */
  private def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        explode(GraftExpressions.elemCounts(TextFunctions.words(col(textCol)))).as("__tc"))
      .select(col(idCol), col("__tc.t").as("token"), col("__tc.c").as("c"))

  /** Row-local per-(doc, bigram) counts (`AdjacentPairs` + `elemCounts`,
    * both in the scan-stage projection). Columns: (idCol, bigram, c).
    */
  private def bigramCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.words(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(col(idCol),
        explode(GraftExpressions.elemCounts(
          GraftExpressions.adjacentPairs(col("__ws")))).as("__bc"))
      .select(col(idCol), col("__bc.t").as("bigram"), col("__bc.c").as("c"))

  /** Attach the per-key corpus statistic (`count(*)` of collapsed rows
    * when `countRows` — the document frequency — else `sum(c)` — the
    * corpus term frequency) as `outCol`, by the chosen shape.
    */
  private def attachFreq(collapsed: DataFrame, keyCol: String,
      countRows: Boolean, outCol: String, shape: FreqAttach): DataFrame = {
    def stat(w: Option[org.apache.spark.sql.expressions.WindowSpec]) = {
      val base = if (countRows) count(lit(1)) else sum(col("c"))
      w.fold(base)(base.over)
    }
    shape match {
      case FreqAttach.Window =>
        collapsed.withColumn(outCol,
          stat(Some(Window.partitionBy(col(keyCol)))))
      case FreqAttach.Join | FreqAttach.BroadcastVocab =>
        val agg = collapsed.groupBy(col(keyCol)).agg(stat(None).as(outCol))
        val side =
          if (shape == FreqAttach.BroadcastVocab) broadcast(agg) else agg.hint("MERGE")
        collapsed.join(side, Seq(keyCol))
    }
  }

  /** TF-IDF token shortlist: top-`k` tokens per document ranked by tf/df.
    * The corpus-size factor N of the textbook tf·(N/df) score is constant
    * within the query, so it scales every score identically and cannot
    * change the ranking; dropping it removes a whole count() job. Output:
    * (idCol, token, tf, df, rnk), unordered.
    */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String, k: Int = 3,
      shape: FreqAttach = FreqAttach.Window): DataFrame = {
    val tf = tokenCounts(df, idCol, textCol)
    val withDf = attachFreq(tf, "token", countRows = true, "df", shape)
    val score = col("c").cast(DoubleType) / col("df").cast(DoubleType)
    withDf
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(score.desc, col("token").asc))
        .cast(LongType))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("token"), col("c").as("tf"), col("df"), col("rnk"))
  }

  /** Unigram-LM bucket score per document: each token scores
    * floor(log2(corpus frequency)) (the `conv`-to-binary length — exact
    * integer log2, engine-independent), aggregated to (n_tokens,
    * sum_bucket, avg_bucket_e4) per document. Output unordered.
    */
  def unigramBucketScore(df: DataFrame, idCol: String, textCol: String,
      shape: FreqAttach = FreqAttach.Window): DataFrame =
    bucketScore(tokenCounts(df, idCol, textCol), idCol, "token", "n_tokens", shape)

  /** Bigram-LM bucket score per document — [[unigramBucketScore]] over
    * adjacent token pairs (a closer perplexity proxy: word-order breakage
    * that a bag-of-words unigram score cannot see lowers this one).
    * BroadcastVocab is accepted but almost never right here: a
    * corpus-scale BIGRAM vocabulary grows ~linearly with the corpus.
    */
  def bigramBucketScore(df: DataFrame, idCol: String, textCol: String,
      shape: FreqAttach = FreqAttach.Window): DataFrame =
    bucketScore(bigramCounts(df, idCol, textCol), idCol, "bigram", "n_bigrams", shape)

  private def bucketScore(collapsed: DataFrame, idCol: String, keyCol: String,
      nCol: String, shape: FreqAttach): DataFrame =
    attachFreq(collapsed, keyCol, countRows = false, "__freq", shape)
      .withColumn("__bucket",
        (length(conv(col("__freq"), 10, 2)) - 1).cast(LongType))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as(nCol),
        sum(col("c") * col("__bucket")).as("sum_bucket"))
      .withColumn("avg_bucket_e4",
        floor(col("sum_bucket").cast(DoubleType) * 1e4 / col(nCol).cast(DoubleType))
          .cast(LongType))
      .select(col(idCol), col(nCol), col("sum_bucket"), col("avg_bucket_e4"))
}
