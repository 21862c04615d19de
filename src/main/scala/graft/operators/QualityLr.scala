package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DotExactExpression

/** Distributed LOGISTIC-REGRESSION quality classifier — the
  * "classifier-based quality filtering" stage of GPT-3/PaLM-style
  * pipelines (Brown et al. 2020, Appendix A: an LR over cheap
  * features scores every document; the scores drive sampling). Here
  * the labels DISTILL the q82 rule cascade (weak supervision: train a
  * smooth scorer to mimic hard rules, then rank by probability
  * instead of a binary verdict).
  *
  * Training is full-batch gradient descent with a FIXED iteration
  * count and learning rate — not an adaptive optimizer — because the
  * contract is exact replayability: every step is
  *
  *  - margin m = Σⱼ wⱼ·xⱼ via the DECIMAL(18,12)-quantized product
  *    sum ([[graft.functions.DotExactKernel.dotD]]), rounded 9 dp;
  *  - p = 1/(1+exp(−m)) in IEEE, rounded 9 dp (the q114 ln/exp
  *    cross-engine precedent);
  *  - gradient gⱼ = Σᵢ (yᵢ−pᵢ)·xᵢⱼ as a DECIMAL(38,12)-exact sum;
  *  - update wⱼ ← round(wⱼ + lr·gⱼ/n, 9), driver-side.
  *
  * so the DuckDB oracle replays all iterations as unrolled CTEs and
  * the final per-doc scores hash-match bit-for-bit.
  *
  * 100 TB shape: the feature frame is persisted once; each iteration
  * is ONE map-side-combinable aggregation producing `dims` slim
  * values (the per-partition partials are the only shuffle), and the
  * model is a `dims`-sized driver collect redeployed as plan
  * literals — the BPE-merge/k-means-seed loop discipline. Scoring is
  * a pure per-row projection under the final plan-constant weights.
  */
object QualityLr {

  /** HALF_UP 9-dp round of a double (shortest-repr, the SQL ROUND). */
  private def r9(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Train on `feats` — must have `y` (0/1 double) and `x`
    * (ARRAY<DOUBLE> of length `dims`, leading 1.0 intercept).
    * Returns the 9-dp weight vector.
    */
  def train(feats: DataFrame, dims: Int, iters: Int, lr: Double): Array[Double] = {
    require(dims >= 1 && iters >= 1 && lr > 0, s"bad dims=$dims iters=$iters lr=$lr")
    import graft.core.OpCache.TrackedPersist
    val f = feats.persistTracked
    val n = f.count()
    require(n > 0, "empty training frame")
    var w = Array.fill(dims)(0.0)
    for (_ <- 1 to iters) {
      val resid = col("y") - p9(col("x"), w)
      val grads = f.select((0 until dims).map(j =>
          sum((resid * element_at(col("x"), j + 1)).cast("decimal(38,12)"))
            .as(s"g$j")): _*)
        .head()
      w = Array.tabulate(dims)(j =>
        r9(w(j) + lr * grads.getDecimal(j).doubleValue() / n))
    }
    w
  }

  /** p = round(σ(round(w·x, 9)), 9) under plan-literal weights. */
  def p9(x: Column, w: Array[Double]): Column = {
    val wLit = array(w.map(lit(_)).toIndexedSeq: _*)
    val m9 = round(DotExactExpression.dotExactD(x, wLit), 9)
    round(lit(1.0) / (lit(1.0) + exp(-m9)), 9)
  }
}
