package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Incremental materialized-aggregate maintenance: keep a stored table
  * of MERGEABLE per-key partials and refresh it from a delta batch
  * without re-scanning history — the aggregate twin of the q71
  * MERGE-style row upsert, and the standard shape for "nightly stats
  * over an append-only 100 TB fact table".
  *
  * The view stores algebraic partial state, not finished values:
  * count, decimal sum (exactly associative — Exact.dsum's argument, so
  * old⊕delta is bit-identical to a full recompute at any batch
  * split), min/max of the value and of the date. Any new batch —
  * including one overlapping existing keys — folds in with ONE
  * group-by over (|view| + |delta|) partial rows; history is never
  * touched. Refresh cost is therefore O(delta + keys), independent of
  * total fact volume; with the fact table date-partitioned the delta
  * scan itself is partition-pruned to the new day(s).
  *
  * What does NOT fit this shape (by design): non-algebraic aggregates
  * (exact distinct counts, exact medians). Their mergeable stand-ins —
  * HLL sketches (q45), GK quantile summaries (q58) — drop into the
  * same partial-row schema because sketch union is associative too.
  */
object IncrementalAgg {

  /** Per-key mergeable partials of `valueCol` (+ observed date range
    * of `dateCol`). The decimal sum keeps full precision BETWEEN
    * batches — finishing to double happens only in [[finish]]; casting
    * per-batch would round each partial and drift from the full
    * recompute by ulps.
    *
    * Overflow bound: DECIMAL(38,6) holds 32 integer digits, so the
    * bit-identical-merge guarantee stands while a key's running |sum|
    * stays below 10³² — at one trillion rows/key that is an average
    * |value| of 10²⁰ before the bound is even approached. Past it,
    * non-ANSI Spark would make the partial silently NULL rather than
    * fail; run refreshes under `spark.sql.ansi.enabled=true` (the
    * Spark 4 default) to turn that silent divergence into an error.
    */
  def partials(df: DataFrame, keys: Seq[String], valueCol: String,
               dateCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("_n"),
      sum(col(valueCol).cast(DecimalType(38, 6))).as("_sum"),
      min(col(valueCol)).as("_vmin"),
      max(col(valueCol)).as("_vmax"),
      min(col(dateCol)).as("_dmin"),
      max(col(dateCol)).as("_dmax"))

  /** Fold partial batches (stored view ∪ delta) into one partial row
    * per key. Associative and commutative — any batch split of the
    * fact table merges to the same state.
    */
  def merge(parts: DataFrame, keys: Seq[String]): DataFrame =
    parts.groupBy(keys.map(col): _*).agg(
      sum(col("_n")).as("_n"),
      sum(col("_sum")).as("_sum"),
      min(col("_vmin")).as("_vmin"),
      max(col("_vmax")).as("_vmax"),
      min(col("_dmin")).as("_dmin"),
      max(col("_dmax")).as("_dmax"))

  /** Finish partials to user-facing values. */
  def finish(merged: DataFrame, keys: Seq[String]): DataFrame =
    merged.select(
      keys.map(col) ++ Seq(
        col("_n").cast(LongType).as("n"),
        col("_sum").cast(DoubleType).as("total"),
        col("_vmin").as("vmin"),
        col("_vmax").as("vmax"),
        col("_dmin").as("d_min"),
        col("_dmax").as("d_max")): _*)

  // ── sketch-state partials ──────────────────────────────────────────
  // The same view⊕delta shape for the NON-algebraic aggregate this
  // file's header rules out in exact form: approximate distinct counts
  // via HLL. The stored partial is the serialized sketch (fixed-size
  // binary per key); union is associative and commutative — HLL state
  // merges by per-register max (dense) / coupon-set union (sparse), so
  // ANY batch split of the fact table unions to the SAME sketch state
  // and the SAME estimate as a from-scratch rebuild. Gated by q78:
  // incremental estimate == full-rebuild estimate, and both within the
  // q45-style exact-count bound.

  /** Per-key mergeable sketch partials: row count, HLL sketch of
    * `distinctCol` (Datasketches, default lgK=12 ⇒ rsd ≈ 1.6%), and
    * the observed date range of `dateCol`.
    */
  def sketchPartials(df: DataFrame, keys: Seq[String], distinctCol: String,
                     dateCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("_n"),
      hll_sketch_agg(col(distinctCol)).as("_hll"),
      min(col(dateCol)).as("_dmin"),
      max(col(dateCol)).as("_dmax"))

  /** Fold sketch-partial batches (stored view ∪ delta) into one
    * partial row per key — history is never re-scanned.
    */
  def sketchMerge(parts: DataFrame, keys: Seq[String]): DataFrame =
    parts.groupBy(keys.map(col): _*).agg(
      sum(col("_n")).as("_n"),
      hll_union_agg(col("_hll")).as("_hll"),
      min(col("_dmin")).as("_dmin"),
      max(col("_dmax")).as("_dmax"))

  /** Finish sketch partials: estimate the distinct count. */
  def sketchFinish(merged: DataFrame, keys: Seq[String]): DataFrame =
    merged.select(
      keys.map(col) ++ Seq(
        col("_n").cast(LongType).as("n"),
        hll_sketch_estimate(col("_hll")).as("approx_distinct"),
        col("_dmin").as("d_min"),
        col("_dmax").as("d_max")): _*)
}
