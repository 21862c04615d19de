package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
