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
}
