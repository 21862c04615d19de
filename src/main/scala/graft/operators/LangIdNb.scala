package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{LangNbExpressions, LangNbModel}

/** In-engine training for the hashed char-n-gram naive-Bayes language
  * classifier ([[graft.functions.LangNbModel]]) — the CCNet-grade
  * replacement for the 4-language marker-word argmax
  * ([[graft.functions.Text.langId]]): given ANY labeled corpus, fit
  * per-language hashed character-n-gram statistics and ship them as a
  * plan-constant kernel.
  *
  * Execution shape at 100 TB (the [[Dsir]] discipline): FIT is one
  * map-side-combinable `groupBy(lang, bucket)` — shuffle ∝ L·B model
  * rows, never the corpus — plus a model-sized collect (L·B longs; a
  * 4-language 1024-bucket model is 32 KB). SCORE is a per-row
  * codegen'd projection with the model riding the plan: no join, no
  * shuffle, streaming-capable for free.
  */
object LangIdNb {

  /** Character n-grams of `text` as an array: codepoint-windowed
    * substrings at every start position (length-n suffix windows
    * excluded by the length filter — `substr` past the end yields a
    * short tail, filtered out, so the `when/otherwise` empty-array
    * cast dance is unnecessary). Engine-portable: Spark and DuckDB
    * `substr`/`length` both count codepoints.
    */
  def charNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"ngram order must be >= 1, got $n")
    filter(
      transform(sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
        i => text.substr(i, lit(n))),
      g => length(g) === n)
  }

  /** Per-(language, bucket) n-gram occurrence counts — the model's
    * sufficient statistics as a DataFrame (≤ L·B rows, one
    * map-side-combinable shuffle). Bucket = md5-48-prefix mod B
    * ([[Dsir.bucketOf]], the engine-portable feature hash).
    */
  def fitCounts(labeled: DataFrame, textCol: String, langCol: String,
      buckets: Int, n: Int): DataFrame =
    labeled
      .select(col(langCol).as("lang"),
        explode(charNgrams(col(textCol), n)).as("_ng"))
      .select(col("lang"), Dsir.bucketOf(col("_ng"), buckets).as("bucket"))
      .groupBy("lang", "bucket").agg(count(lit(1)).as("cnt"))

  /** Fit the full model: n-gram statistics + document-count priors,
    * both model-sized collects redeployed as a plan constant.
    */
  def fitModel(labeled: DataFrame, textCol: String, langCol: String,
      buckets: Int = 1024, n: Int = 3): LangNbModel = {
    val counts = fitCounts(labeled, textCol, langCol, buckets, n)
      .collect() // model-sized: <= L*B rows (the DsirLm precedent)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docs = labeled.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("n"))
      .collect() // L rows
      .map(r => (r.getString(0), r.getLong(1)))
    LangNbModel(counts, docs, buckets, n)
  }

  /** Score every document map-side under a fitted model:
    * (idCol, lang_pred, score). Texts shorter than n codepoints get
    * ('und', null) — no features, no evidence.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      model: LangNbModel): DataFrame =
    docs.select(col(idCol),
        LangNbExpressions.langNbScore(col(textCol), model).as("_s"))
      .select(col(idCol), col("_s.lang").as("lang_pred"),
        col("_s.score").as("score"))
}
