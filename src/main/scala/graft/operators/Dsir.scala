package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exact
import graft.functions.Text

/** Data Selection via Importance Resampling (Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS
  * 2023): pick the raw-corpus documents that look most like a small
  * curated target corpus. Both corpora are reduced to hashed n-gram
  * bag-of-features (unigrams + bigrams hashed into `buckets`
  * buckets); each bucket gets a log importance ratio
  * λ_b = ln p̂_target(b) − ln p̂_raw(b) under Laplace smoothing; a
  * document's log weight is Σ_b c_b·λ_b over its n-gram occurrences;
  * selection is Gumbel-top-k — adding an independent Gumbel to each
  * log weight and taking the k largest keys draws a sample WITHOUT
  * replacement proportional to exp(log w) (Kool et al., ICML 2019),
  * which is DSIR's resampling step exactly.
  *
  * Determinism contract (the q98/Exact discipline): bucket ids come
  * from the md5-prefix hash (bit-identical in any engine, q103
  * discipline); each occurrence's λ is ONE ln over an exact-integer
  * product ratio, rounded to 9 dp before aggregation; per-doc sums
  * are exact DECIMAL(38,9) (order- and partitioning-independent);
  * the Gumbel uses the md5-derived uniform, so the whole selection
  * is a pure function of corpus content and replayable by a SQL
  * oracle.
  *
  * Execution shape at 100 TB: fitting is one map-side-combinable
  * `groupBy(bucket)` per corpus — shuffle ∝ `buckets` (a model-sized
  * table, e.g. 10k rows), NOT the corpus. Scoring joins each n-gram
  * occurrence against the BROADCAST bucket model (no shuffle) and
  * partial-aggregates per doc — one shuffle ∝ documents. Selection
  * is the q110/q116 mergeable bottom-k: every partition reduces to
  * ≤k pairs before a k-row shuffle. No window, no sort of the
  * corpus, nothing driver-side bigger than the k selected ids.
  */
object Dsir {

  /** Unigram + bigram occurrences of `textCol` as one exploded
    * `_ng` column, keeping `keep` alongside.
    */
  private def ngrams(df: DataFrame, textCol: String, keep: Column*): DataFrame = {
    val t = Text.tokens(col(textCol))
    val uni = df.select(keep :+ explode(t).as("_ng"): _*)
    val bi = df.select(keep :+ explode(zip_with(
        slice(t, lit(1), greatest(size(t) - 1, lit(0))),
        slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("_ng"): _*)
    uni.unionByName(bi)
  }

  /** Feature-hash an n-gram to a bucket: md5 48-bit prefix mod
    * `buckets` — engine-portable and uniform (the q103 md5-prefix
    * discipline; the poly fingerprint is NOT uniform enough here).
    */
  def bucketOf(ng: Column, buckets: Int): Column =
    pmod(conv(substring(md5(ng), 1, 12), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Fit the hashed bag-of-ngrams model: (bucket BIGINT, cnt BIGINT),
    * one row per OBSERVED bucket (≤ `buckets` rows — model-sized;
    * broadcast it at scoring time). One map-side-combinable shuffle.
    */
  def fitBucketCounts(corpus: DataFrame, textCol: String, buckets: Int): DataFrame =
    // ONE corpus scan through the native n-gram bucket kernel — the
    // HOF form below ([[fitBucketCountsHof]]) scanned the corpus
    // twice (unigram ∪ bigram explodes) and hashed every occurrence
    // through the md5/conv/substring expression chain; identical
    // counts (DsirSpec locks kernel ≡ HOF; DsirKernel.bucket ≡
    // bucketOf is additionally under the q118/q121 oracle gate)
    corpus.select(explode(graft.functions.DsirExpressions.ngramBuckets(
        Text.tokens(col(textCol)), buckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** The prior two-scan HOF formulation, kept as the executable spec
    * of [[fitBucketCounts]]'s semantics.
    */
  def fitBucketCountsHof(corpus: DataFrame, textCol: String, buckets: Int): DataFrame =
    ngrams(corpus, textCol)
      .select(bucketOf(col("_ng"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-document log importance weight under target/raw hashed
    * models with Laplace smoothing:
    *
    *   λ_b = round(ln[ (T_b+1)·(R+B) / ((R_b+1)·(T+B)) ], 9)
    *   log w(doc) = Σ_occurrences λ_bucket(occurrence)
    *
    * where T_b/R_b are bucket counts, T/R total n-gram counts, B the
    * bucket count. The integer products stay ≤ 2^53 for corpora up
    * to ~10^26 n-gram pairs-of-totals, so the double quotient — and
    * therefore the single ln — is computed from EXACT inputs and
    * matches any IEEE engine bit-for-bit.
    *
    * Output: (idCol, n_ngrams BIGINT, logw DOUBLE rounded 6 dp —
    * backed by an exact DECIMAL(38,9) sum). Docs with zero tokens
    * have no n-grams and are absent (no evidence either way).
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      targetCounts: DataFrame, rawCounts: DataFrame, buckets: Int): DataFrame = {
    val totals = targetCounts.agg(sum(col("cnt")).as("_tt"))
      .crossJoin(rawCounts.agg(sum(col("cnt")).as("_rt")))
    val occ = ngrams(docs, textCol, col(idCol))
      .select(col(idCol), bucketOf(col("_ng"), buckets).as("bucket"))
    val lam = occ
      .join(broadcast(targetCounts.withColumnRenamed("cnt", "_tc")), Seq("bucket"), "left")
      .join(broadcast(rawCounts.withColumnRenamed("cnt", "_rc")), Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("_lam", round(log(
        ((coalesce(col("_tc"), lit(0L)) + 1L) * (col("_rt") + buckets)).cast("double") /
          ((coalesce(col("_rc"), lit(0L)) + 1L) * (col("_tt") + buckets)).cast("double")), 9))
    lam.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        Exact.dsum(col("_lam"), scale = 9).as("_lw"))
      .select(col(idCol), col("n_ngrams"),
        round(col("_lw").cast("double"), 6).as("logw"))
  }

  /** Gumbel-top-k resample WITHOUT replacement ∝ exp(logw): each doc
    * gets key = logw + Gumbel(u) with Gumbel(u) = −ln(−ln u), and the
    * k LARGEST keys are the sample (Kool et al., ICML 2019). `u` must
    * be a deterministic uniform STRICTLY inside (0,1) — u = 1 makes
    * the nested ln −∞ (use (h48 + 0.5)/2^48 from the md5 prefix: both
    * endpoints excluded, every value exact in double). Keys are
    * 6-dp-scaled to exact BIGINTs; ties break on ascending id — fully
    * deterministic.
    *
    * Output: (idCol, key BIGINT) — the scaled NEGATED key, ascending
    * (smallest = most target-like after noise), exactly the
    * mergeable-bottom-k order. One ≤k-per-partition shuffle.
    */
  def resample(weighted: DataFrame, idCol: String, logwCol: String,
      u: Column, k: Int): DataFrame = {
    val key = (-round((col(logwCol) - log(-log(u))) * 1e6)).cast("long")
    weighted
      .select(key.as("_k"), col(idCol).cast("long").as("_id"))
      .agg(graft.functions.BottomK.bottomK(k)(col("_k"), col("_id")).as("_s"))
      .select(explode(col("_s")).as("pair"))
      .select(col("pair._2").as(idCol), col("pair._1").as("key"))
  }
}
