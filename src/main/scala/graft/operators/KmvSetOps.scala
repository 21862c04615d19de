package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.BottomK

/** KMV set-operation estimation (Beyer, Haas, Reinwald, Sismanis &
  * Gemulla, "On Synopses for Distinct-Value Estimation Under Multiset
  * Operations", SIGMOD 2007): bottom-k hash sketches of two sets
  * support UNION cardinality (the k-th smallest hash of the merged
  * sketch), JACCARD (the fraction of the merged k-set present in both
  * input sketches), and therefore INTERSECTION — the "how much does
  * this month's crawl overlap last month's?" question at sketch cost
  * instead of a full distinct join.
  *
  * Determinism: hashes are the md5 48-bit prefix (uniform AND
  * engine-portable — the q103 discipline; the poly fingerprint's
  * non-uniformity would bias the estimator 1000×), so the sketches,
  * every estimate, and the gate are pure functions of set content.
  *
  * 100 TB shape: each sketch is a distinct-collapse (map-side
  * partial) followed by a TakeOrdered k — per-partition k then a
  * k-row merge, never a global sort; the estimator itself runs on
  * three ≤k-row frames.
  */
object KmvSetOps {

  /** 2^48 — the md5-prefix hash space. */
  val HashSpace: Double = 281474976710656.0

  /** The k smallest distinct md5-48 hashes of `valueCol`: (h BIGINT),
    * ascending.
    */
  def kmvSketch(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.select(valueCol.as("_v")).distinct()
      .select(conv(substring(md5(col("_v")), 1, 12), 16, 10).cast("long").as("h"))
      .distinct() // hash collisions across distinct values: keep KMV's distinct-hash semantics
      .orderBy("h").limit(k)
  }

  /** Per-group KMV sketches in ONE pass: for every value of
    * `groupCol`, the k smallest distinct md5-48 hashes of `valueCol`
    * within that group. Output: (grp, h BIGINT) rows, ≤k per group.
    *
    * The aggregation is the MERGEABLE grouped bottom-k (q110's
    * [[graft.functions.BottomKByHash]]; sorted-distinct buffer, so
    * sketch semantics — distinct hashes — hold without any pre-
    * `distinct()`): map-side partials reduce every partition to ≤k
    * hashes per group BEFORE the shuffle, so sketching a trillion-row
    * corpus per source shuffles k·|groups|·partitions rows, never the
    * corpus — the window formulation (`row_number() OVER (PARTITION
    * BY grp ORDER BY h)`) would shuffle every distinct hash instead.
    */
  def groupedKmvSketch(df: DataFrame, groupCol: Column, valueCol: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.select(groupCol.as("grp"),
        conv(substring(md5(valueCol), 1, 12), 16, 10).cast("long").as("_h"))
      .groupBy(col("grp"))
      .agg(BottomK.bottomK(k)(col("_h"), lit(0L)).as("_bk"))
      .select(col("grp"), explode(col("_bk")).as("_p"))
      .select(col("grp"), col("_p._1").as("h"))
  }

  /** All-pairs overlap matrix over per-group sketches (`grp`, `h`)
    * as produced by [[groupedKmvSketch]] with the same `k`: one row
    * per unordered group pair (grp_a < grp_b) carrying the merged
    * k-sketch stats and the SIGMOD'07 union / Jaccard / intersection
    * estimates — "which sources are re-crawls of each other?" as a
    * G×G heat map for sketch cost.
    *
    * Scale contract: |groups| must be model-sized (sources,
    * languages, shards — not documents); the pair grid is C(G,2)
    * rows and each pair's merged frame is ≤2k rows, so the per-pair
    * rank window partitions on (grp_a, grp_b) and never sees more
    * than 2k rows per partition. The corpus itself was already
    * reduced by the sketch pass.
    *
    * Output: (grp_a, grp_b, n_merged, n_both, h_k, union_est,
    * jaccard_est, intersection_est), estimates 6-dp, small-set exact
    * fallback as [[overlapEstimate]].
    */
  def overlapMatrix(sketches: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val sk = sketches.select(col("grp"), col("h"))
    val grps = sk.select(col("grp")).distinct()
    val pairs = grps.select(col("grp").as("grp_a"))
      .join(grps.select(col("grp").as("grp_b")), col("grp_a") < col("grp_b"))
    val sideA = pairs
      .join(sk.select(col("grp").as("grp_a"), col("h")), Seq("grp_a"))
      .select(col("grp_a"), col("grp_b"), col("h"), lit(1).as("_ina"), lit(0).as("_inb"))
    val sideB = pairs
      .join(sk.select(col("grp").as("grp_b"), col("h")), Seq("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("h"), lit(0).as("_ina"), lit(1).as("_inb"))
    val merged = sideA.unionByName(sideB)
      .groupBy("grp_a", "grp_b", "h")
      .agg(max(col("_ina")).as("_ina"), max(col("_inb")).as("_inb"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy("grp_a", "grp_b").orderBy("h")))
      .filter(col("_rk") <= k)
    merged.groupBy("grp_a", "grp_b")
      .agg(count(lit(1)).as("n_merged"),
        sum((col("_ina") * col("_inb")).cast("long")).as("n_both"),
        max(col("h")).as("h_k"))
      .select(col("grp_a"), col("grp_b"), col("n_merged"), col("n_both"), col("h_k"),
        round(when(col("n_merged") < k, col("n_merged").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
            col("h_k").cast("double")), 6).as("union_est"),
        round(col("n_both").cast("double") / col("n_merged").cast("double"), 6)
          .as("jaccard_est"))
      .withColumn("intersection_est",
        round(col("jaccard_est") * col("union_est"), 6))
  }

  /** Union / Jaccard / intersection estimates from two k-sketches
    * (both built with the same `k`). One row:
    * (k, h_k BIGINT, union_est, jaccard_est, intersection_est — all
    * 6-dp doubles). Degenerate inputs (fewer than k distinct hashes
    * in the merged set) fall back to the exact union count of the
    * merged hashes (the standard small-set escape).
    */
  def overlapEstimate(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val merged = a.select("h").unionByName(b.select("h")).distinct()
      .orderBy("h").limit(k)
    val inBoth = merged
      .join(a.select(col("h")), Seq("h"), "left_semi")
      .join(b.select(col("h")), Seq("h"), "left_semi")
    val stats = merged.agg(count(lit(1)).as("n_merged"), max(col("h")).as("h_k"))
      .crossJoin(broadcast(inBoth.agg(count(lit(1)).as("n_both"))))
    stats.select(
      lit(k.toLong).as("k"),
      col("h_k"),
      round(when(col("n_merged") < k, col("n_merged").cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
          col("h_k").cast("double")), 6).as("union_est"),
      round(col("n_both").cast("double") / col("n_merged").cast("double"), 6)
        .as("jaccard_est"))
      .withColumn("intersection_est",
        round(col("jaccard_est") * col("union_est"), 6))
  }
}
