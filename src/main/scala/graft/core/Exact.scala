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
  *
  * Domain assumption: inputs are quantized at <= `scale` decimal places
  * (true of every measure in the reference and the test corpus, which
  * carry 2dp values). Inputs with more precision are rounded to `scale`
  * dp at the cast — the exactness claim is about summation order, not
  * about representing arbitrary doubles.
  */
object Exact {

  /** String ordering by Unicode CODE POINTS — the order `ORDER BY` /
    * `MIN(varchar)` produces in UTF-8-native engines (DuckDB compares
    * UTF-8 bytes, which is code-point order). Java's natural `String`
    * ordering compares UTF-16 code UNITS, which disagrees for
    * supplementary-plane characters: a surrogate pair's lead unit
    * (0xD800–0xDBFF) sorts BELOW U+E000–U+FFFF even though the coded
    * character is above U+FFFF. Any driver-side `.sorted` whose order
    * feeds a cross-engine determinism claim (vocabulary CDFs, phrase
    * automata) must use this ordering, not the default.
    */
  val codePointOrdering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val la = a.length; val lb = b.length
      var i = 0
      while (i < la && i < lb) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(i)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
      }
      Integer.compare(la - i, lb - i)
    }
  }

  /** Assert the session is in ANSI mode. The integer-exact iterative
    * operators ([[graft.operators.PageRank]],
    * [[graft.operators.BpeTrainer]]) document a fail-loud contract —
    * a long overflow THROWS rather than wrapping, which is what makes
    * their bit-exact oracle guarantee trustworthy — but that contract
    * is enforced by `spark.sql.ansi.enabled` (Spark 4's default), not
    * by the operators' own arithmetic. A session with ANSI disabled
    * would wrap silently and break the guarantee without any error,
    * so the operators check HERE, at entry, once per call.
    */
  def requireAnsi(spark: org.apache.spark.sql.SparkSession, op: String): Unit =
    require(spark.conf.get("spark.sql.ansi.enabled", "true").toBoolean,
      s"$op requires spark.sql.ansi.enabled=true: its integer-exact " +
        "overflow-throws contract silently degrades to wraparound under " +
        "non-ANSI arithmetic")

  /** Exact sum of a double column: decimal-cast, sum, back to double.
    * Matches DuckDB `CAST(SUM(CAST(c AS DECIMAL(38,s))) AS DOUBLE)`.
    * DECIMAL(38,6) holds ±10^32 — no overflow headroom issue at 100 TB
    * (a 10^14-row sum of 10^6-scale values is 10^20).
    */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(38, scale))).cast(DoubleType)

  /** Exact mean: exact sum / count of non-nulls (double division is a
    * single IEEE op — deterministic given identical inputs).
    */
  def davg(c: Column, scale: Int = 6): Column =
    dsum(c, scale) / count(c)

  /** Duration-weighted mean (reference `aggregate_workouts`,
    * populate_from_json.py:385-425): sum(v*w)/sum(w). The reference
    * crashes on a zero weight sum (populate_from_json.py:420); per
    * SURVEY.md Q5 we emit 0.0 instead (also covers the all-null group).
    * The v*w product is one IEEE multiply, then exact-summed.
    */
  def weightedMean(v: Column, w: Column, scale: Int = 6): Column = {
    val den = dsum(w, scale)
    coalesce(when(den =!= 0.0, dsum(v * w, scale) / den), lit(0.0))
  }
}
