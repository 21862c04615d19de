package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Skip-gram (center, context) pair extraction — the training-pair
  * step of word2vec (Mikolov et al. 2013): every token pairs with its
  * neighbors within ±`window` positions. With [[Subsample]] (q166)
  * and [[NegativeSampling]] (q180) this completes the trilogy: a
  * corpus in, subsampled pair stream + noise table out.
  *
  * 100 TB shape: pure map-side array arithmetic — ONE posexplode of
  * the token stream fans out to ≤ 2·window offset rows per token
  * (bounded, no self-join on position), and the only shuffle is the
  * (center, context) count rollup, partial-agg combinable and
  * vocabulary-pair-sized after combination. No windows, no joins.
  */
object SkipGram {

  /** (center, context, cnt) over all docs; `window` ≥ 1. */
  def pairCounts(docs: DataFrame, textCol: String, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    docs.select(Text.tokens(col(textCol)).as("_t"))
      .select(col("_t"), posexplode(col("_t")).as(Seq("_i", "center")))
      // _i is 0-based; positions p are 1-based into _t
      .select(col("_t"), col("center"), explode(expr(
        s"filter(transform(sequence(-$window, $window), o -> _i + o + 1), " +
          "p -> p >= 1 AND p <= size(_t) AND p != _i + 1)")).as("_p"))
      .select(col("center"), element_at(col("_t"), col("_p")).as("context"))
      .groupBy("center", "context").agg(count(lit(1)).as("cnt"))
  }
}
