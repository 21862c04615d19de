package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Order-independent (exact) aggregation helpers.
  *
  * Summing doubles is order-dependent: a 1000-executor cluster and a
  * single-node oracle will disagree in the low bits, and rounding only
  * hides that until a value lands near a boundary. Casting to DECIMAL
  * before the sum makes the aggregate exact and therefore identical on
  * any engine and any degree of parallelism — this is both a
  * correctness-parity tool (DuckDB oracle) and a determinism guarantee
  * at scale (same answer at 32 threads or 1000 executors).
  */
object Exact {

  /** Exact sum of a double column: decimal-cast, sum, back to double.
    * Matches DuckDB `CAST(SUM(CAST(c AS DECIMAL(18,s))) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact mean: exact sum / count of non-nulls (double division is a
    * single IEEE op — deterministic given identical inputs).
    */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  /** Duration-weighted mean (reference `aggregate_workouts`,
    * populate_from_json.py:385-425): sum(v*w)/sum(w), null when the
    * weight sum is 0 (the reference crashes there — Q5 in SURVEY.md).
    * The v*w product is one IEEE multiply, then exact-summed.
    */
  def weightedMean(v: Column, w: Column, scale: Int = 6): Column = {
    val den = dsum(w, scale)
    when(den =!= 0.0, dsum(v * w, scale) / den)
  }
}
