package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-based domain mixing — the multilingual/domain sampling
  * stage of pretraining pipelines (Lample & Conneau 2019; XLM-R,
  * Conneau et al. 2020): sampling shares ∝ n_d^α with α < 1 upweight
  * low-resource domains relative to their raw counts. Given per-domain
  * counts, allocate an integer document budget by the LARGEST-REMAINDER
  * method over α-scaled shares, then draw each domain's quota as a
  * deterministic content-keyed uniform sample.
  *
  * Determinism contract: n_d^α is ONE libm pow over an exact integer,
  * rounded to 9 dp and scaled to an exact BIGINT weight; from there
  * everything is integer arithmetic — quota_d = ⌊B·w_d / W⌋ plus one
  * for the largest integer remainders (B·w_d − quota_d·W), ties on
  * domain ascending. The sample itself is the q110 md5-prefix
  * bottom-k. A SQL oracle replays every step.
  *
  * Execution shape at 100 TB: the counts aggregate is map-side
  * combinable (shuffle ∝ domains); the allocation runs on the
  * MODEL-SIZED domain table (a window over |domains| rows — hundreds,
  * never corpus data); the draw is the mergeable grouped bottom-k
  * (≤ budget rows per partition-group shuffle). Nothing corpus-sized
  * ever sorts or windows.
  */
object Mixing {

  /** Integer budget allocation over α-scaled domain shares:
    * (keyCol, n BIGINT, quota BIGINT) with Σ quota = budget exactly
    * (largest-remainder / Hamilton apportionment). Quotas are capped
    * at n_d (a domain cannot supply more docs than it has); capped
    * slack is NOT redistributed — the standard behavior when a
    * low-resource domain exhausts.
    */
  def alphaQuotas(counts: DataFrame, keyCol: String,
      alpha: Double, budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    // budget·_w products can exceed Long.MaxValue for huge domains —
    // integer-exact operators require ANSI so overflow is loud
    graft.core.Exact.requireAnsi(counts.sparkSession, "Mixing.alphaQuotas")
    // one pow per DOMAIN (model-sized), rounded 9 dp → exact scaled long
    val w = counts.withColumn("_w",
      round(pow(col("n").cast("double"), lit(alpha)) * 1e9).cast("long"))
    val tot = w.agg(sum(col("_w")).as("_tw"))
    val scored = w.crossJoin(broadcast(tot))
      .withColumn("_q", expr(s"(${budget}L * _w) div _tw"))
      .withColumn("_r", expr(s"${budget}L * _w - _q * _tw"))
    // leftover seats to the largest remainders — a window over the
    // DOMAIN table only (|domains| rows; never corpus data)
    val leftRank = row_number().over(
      Window.orderBy(col("_r").desc, col(keyCol)))
    scored
      .withColumn("_lr", leftRank)
      .crossJoin(broadcast(scored.agg(sum(col("_q")).as("_qsum"))))
      .select(col(keyCol), col("n"),
        least(col("n"),
          col("_q") + when(col("_lr") <= lit(budget) - col("_qsum"), 1L)
            .otherwise(0L)).as("quota"))
  }

  /** Draw each domain's quota as the md5-bottom-k deterministic
    * uniform sample: (keyCol, n, quota, pick BIGINT — 1-based sample
    * rank, idCol). `hash` must be the content-keyed uniform BIGINT
    * (q110 discipline). maxQuota bounds the per-group buffer — pass
    * the budget (quota ≤ budget always).
    */
  def sampleQuotas(docs: DataFrame, keyCol: String, idCol: String,
      hash: Column, quotas: DataFrame, maxQuota: Int): DataFrame = {
    val sampled = docs
      .select(col(keyCol), hash.as("_h"), col(idCol).cast("long").as("_id"))
      .groupBy(keyCol)
      .agg(graft.functions.BottomK.bottomK(maxQuota)(col("_h"), col("_id")).as("_s"))
      .select(col(keyCol), posexplode(col("_s")))
      .select(col(keyCol), (col("pos") + 1L).as("pick"),
        col("col._1").as("h"), col("col._2").as(idCol))
    sampled.join(broadcast(quotas), Seq(keyCol))
      .filter(col("pick") <= col("quota"))
      .select(col(keyCol), col("n"), col("quota"), col("pick"), col(idCol), col("h"))
  }
}
