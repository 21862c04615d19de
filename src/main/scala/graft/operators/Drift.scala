package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exact
import graft.functions.Text

/** Corpus drift detection between two snapshots (e.g. last month's
  * crawl vs this month's): the Kullback–Leibler divergence of their
  * Laplace-smoothed token distributions, with per-token
  * contributions — KL(p‖q) = Σ_w p_w·ln(p_w/q_w) tells you HOW MUCH
  * the corpus moved, and the top contributors tell you WHAT moved
  * (surging topics, new boilerplate, template churn). The standard
  * distribution-shift monitor for ingestion pipelines.
  *
  * Determinism contract (the q114/q118 discipline): token counts are
  * exact integers; each token's ln(p_w/q_w) is ONE ln over an
  * exact-integer product ratio rounded to 9 dp; the contribution
  * multiplies that by the exact rational p_w in two IEEE ops and
  * rounds at 12 dp; the total is an exact DECIMAL(38,12) sum. A SQL
  * oracle replays every step.
  *
  * Execution shape at 100 TB: two map-side-combinable token counts
  * (shuffle ∝ vocabulary), a full-outer model-sized join, one
  * broadcast totals row, and a TakeOrdered top-k — the corpus is
  * read once per snapshot and nothing vocabulary-sized ever windows.
  */
object Drift {

  /** Per-token drift contributions + the corpus-level KL total.
    *
    * p_w = (a_w+1)/(A+V), q_w = (b_w+1)/(B+V) over the UNION
    * vocabulary V (Laplace — both distributions cover both vocabs).
    * Output: the `k` largest positive contributors (tokens surging in
    * snapshot A relative to B) by (contrib DESC, token), each row
    * carrying (token, cnt_a, cnt_b, contrib, kl_total).
    */
  def klDrift(snapA: DataFrame, snapB: DataFrame, textCol: String,
      k: Int): DataFrame = {
    def counts(df: DataFrame, name: String) = df
      .select(explode(Text.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as(name))
    val joined = counts(snapA, "cnt_a")
      .join(counts(snapB, "cnt_b"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val totals = joined.agg(
      sum(col("cnt_a")).as("_ta"), sum(col("cnt_b")).as("_tb"),
      count(lit(1)).as("_v"))
    val scored = joined.crossJoin(broadcast(totals))
      // ln over exact integer products (the q118 λ shape), 9 dp
      .withColumn("_lnr", round(log(
        ((col("cnt_a") + 1L) * (col("_tb") + col("_v"))).cast("double") /
          ((col("cnt_b") + 1L) * (col("_ta") + col("_v"))).cast("double")), 9))
      // contribution p_w · lnr: two IEEE ops over exact inputs, 12 dp
      .withColumn("contrib", round(
        (col("cnt_a") + 1L).cast("double") / (col("_ta") + col("_v")).cast("double") *
          col("_lnr"), 12))
    val kl = scored.agg(Exact.dsum(col("contrib"), scale = 12).as("kl_total"))
    scored
      .select(col("token"), col("cnt_a"), col("cnt_b"), col("contrib"))
      .orderBy(col("contrib").desc, col("token")).limit(k)
      .crossJoin(broadcast(kl.select(round(col("kl_total"), 12).as("kl_total"))))
  }

  /** Per-GROUP KL against a reference categorical distribution — the
    * continuous-monitoring form of [[klDrift]]: each group (an
    * event-time window, a source, a shard) gets
    * KL(p_group ‖ p_ref) over the REFERENCE vocabulary with Laplace
    * smoothing, so a window whose category mix wanders from the
    * corpus norm lights up. Same arithmetic discipline as
    * [[klDrift]]: one ln over an exact-integer product ratio rounded
    * 9 dp, contribution in two IEEE ops rounded 12 dp, exact DECIMAL
    * sum per group rounded 9 dp.
    *
    * `groupCounts` = (groupCol, typeCol, cntCol) — typically the
    * read-back of a streaming windowed count; `refCounts` =
    * (typeCol, refCnt) — model-sized (category vocabulary), so it
    * broadcasts and the group×type expansion never shuffles the
    * groups. Output: (groupCol, n_events, oov_events, kl).
    *
    * OOV discipline: events whose type is NOT in the reference
    * vocabulary are excluded from the group total (`n_events` counts
    * in-vocabulary events only), so the smoothed group distribution
    * sums to 1 over the reference vocabulary and `kl` is a true
    * KL ≥ 0. The excluded mass is surfaced as `oov_events` — a
    * nonzero value is itself the strongest drift signal (a category
    * the reference has never seen), reported as an exact count
    * rather than laundered through smoothing arithmetic.
    */
  def klAgainstReference(groupCounts: DataFrame, groupCol: String,
      typeCol: String, cntCol: String, refCounts: DataFrame,
      refCntCol: String): DataFrame = {
    val totals = refCounts.agg(
      sum(col(refCntCol)).as("_nr"), count(lit(1)).as("_v"))
    val inVocab = groupCounts.join(
      broadcast(refCounts.select(col(typeCol))), Seq(typeCol), "left_semi")
    val groups = groupCounts.groupBy(groupCol)
      .agg(sum(col(cntCol)).as("_ntot"))
      .join(inVocab.groupBy(groupCol).agg(sum(col(cntCol)).as("_nwi")),
        Seq(groupCol), "left")
      .select(col(groupCol), coalesce(col("_nwi"), lit(0L)).as("_nw"),
        (col("_ntot") - coalesce(col("_nwi"), lit(0L))).as("_oov"))
    val expanded = groups
      .crossJoin(broadcast(refCounts
        .select(col(typeCol), col(refCntCol).as("_ct"))))
      .join(groupCounts.select(col(groupCol), col(typeCol),
        col(cntCol).as("_c")), Seq(groupCol, typeCol), "left")
      .select(col(groupCol), col("_nw"), col("_oov"), col("_ct"),
        coalesce(col("_c"), lit(0L)).as("_c"))
      .crossJoin(broadcast(totals))
    val contrib = expanded
      .withColumn("_lnr", round(log(
        ((col("_c") + 1L) * (col("_nr") + col("_v"))).cast("double") /
          ((col("_ct") + 1L) * (col("_nw") + col("_v"))).cast("double")), 9))
      .withColumn("_contrib", round(
        (col("_c") + 1L).cast("double") / (col("_nw") + col("_v")).cast("double") *
          col("_lnr"), 12))
    // total rounded AT the sum's own scale (12) — rounding tighter
    // (e.g. 9 dp) would park exact .5 midpoints of the decimal sum on
    // a HALF_UP boundary where the two engines' double paths diverge
    contrib.groupBy(groupCol, "_nw", "_oov")
      .agg(round(Exact.dsum(col("_contrib"), scale = 12), 12).as("kl"))
      .select(col(groupCol), col("_nw").as("n_events"),
        col("_oov").as("oov_events"), col("kl"))
  }
}
