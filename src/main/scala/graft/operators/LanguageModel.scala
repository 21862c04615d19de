package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exact
import graft.functions.Text

/** Model-based quality filtering: an n-gram language model trained on
  * a reference corpus scores every document's perplexity, and docs
  * whose perplexity lands outside their language's band are dropped —
  * the CCNet pipeline stage (Wenzek et al., "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data", LREC 2020,
  * which filters Common Crawl on Wikipedia-trained LM perplexity
  * tertiles). CCNet uses a KenLM 5-gram; this operator is the
  * Spark-native bigram form with add-one (Laplace) smoothing — the
  * statistical machinery (count, smooth, log-score, banded filter) at
  * oracle-checkable exactness, with the n-gram order a schema detail.
  *
  * Determinism contract (the q98/Exact discipline): every count is
  * exact integer; each bigram's log-probability is rounded to 9 dp
  * BEFORE summation so both engines agree bit-for-bit; the per-doc
  * sum is an exact DECIMAL aggregation (order-independent at any
  * parallelism); only one final division + exp per doc is floating
  * point. That is what lets a DuckDB oracle replay the whole filter.
  *
  * Execution shape at 100 TB: training is one map-side-combinable
  * `groupBy(w1, w2)` — shuffle ∝ distinct bigrams, not the corpus.
  * Scoring shuffles each doc's bigrams once to join the count table
  * (hot function-word bigrams — "of the" — are the classic skewed
  * join key: AQE splits them; the model table usually broadcasts
  * outright since a bigram LM is tens of millions of rows ≪ corpus).
  * The context table and vocab scalar are derived model-sized frames.
  */
object LanguageModel {

  private def bigrams(df: DataFrame, textCol: String, keep: Column*): DataFrame = {
    val t = Text.tokens(col(textCol))
    df.select(keep :+ explode(zip_with(
        slice(t, lit(1), greatest(size(t) - 1, lit(0))),
        slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("_p"): _*)
      .select(keep :+ col("_p.w1") :+ col("_p.w2"): _*)
  }

  /** Train the bigram model: returns (bigram counts (w1, w2, cnt),
    * vocab — a ONE-ROW frame (v BIGINT) with the training corpus's
    * distinct-token count, the Laplace smoothing denominator mass).
    */
  def trainBigram(train: DataFrame, textCol: String): (DataFrame, DataFrame) = {
    val counts = bigrams(train, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
    val vocab = train
      .select(explode(Text.tokens(col(textCol))).as("_w"))
      .agg(count_distinct(col("_w")).as("v"))
    (counts, vocab)
  }

  /** Per-doc perplexity under the trained model:
    * p(w2|w1) = (c(w1,w2) + 1) / (ctx(w1) + V) with
    * ctx(w1) = Σ_w2 c(w1,w2) (so every conditional sums to 1), and
    * ppl = exp(−mean ln p) over the doc's bigrams. Unseen contexts
    * fall back to the uniform 1/V Laplace mass. Docs with fewer than
    * two tokens have no bigrams and are absent from the output
    * (score them upstream by length rules — a 1-token doc has no LM
    * evidence either way).
    *
    * Output: (idCol, n_bigrams BIGINT, ppl DOUBLE rounded 6 dp).
    */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
      bigramCounts: DataFrame, vocab: DataFrame): DataFrame = {
    val ctx = bigramCounts.groupBy("w1").agg(sum(col("cnt")).as("_ctx"))
    val db = bigrams(docs, textCol, col(idCol))
    val ll = db
      .join(bigramCounts, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("_ll", bround(log(
        (coalesce(col("cnt"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("_ctx"), lit(0L)) + col("v")).cast("double")), 9))
    ll.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        Exact.davg(col("_ll"), scale = 9).as("_avg"))
      .select(col(idCol), col("n_bigrams"),
        bround(exp(-col("_avg")), 6).as("ppl"))
  }
}
