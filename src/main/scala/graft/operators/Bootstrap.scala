package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exact

/** Poisson-bootstrap confidence intervals for corpus statistics
  * (Chamandy et al., "Estimating Uncertainty for Massive Data
  * Streams", Google TR 2012; the production form of the bootstrap at
  * scale): instead of resampling n rows WITH replacement (impossible
  * distributed), each row gets an independent Poisson(1) weight per
  * replicate — the multinomial resample's limit — so R replicate
  * estimates compute in ONE corpus pass as R weighted aggregations,
  * and the replicate spread estimates the sampling distribution.
  *
  * Determinism contract: the Poisson draw inverts the CDF on the
  * md5-48 uniform of (row key, replicate index) — a pure function of
  * content, bit-identical in any engine (CDF thresholds are embedded
  * as Scala-printed shortest-repr double literals, the EWMA-constant
  * discipline). Weighted means are exact-integer-count ×
  * DECIMAL-summed values; the CI is the empirical [lo, hi] quantile
  * pair of the R replicate means (exact order statistics on R
  * values, no interpolation).
  *
  * 100 TB shape: ONE pass — rows explode to R (row, weight) pairs
  * (R ≈ 32–128; generator input is cheap expressions only), the R
  * means partial-aggregate map-side, and the quantile runs on an
  * R-row frame.
  */
object Bootstrap {

  /** Cumulative Poisson(1) thresholds P(X ≤ k), k = 0..5 (weights cap
    * at 6 — the residual P(X > 5) ≈ 5.9·10⁻⁴ maps to weight 6, the
    * standard truncation). Printed into oracle SQL verbatim so both
    * engines compare against the SAME doubles.
    */
  val PoissonCdf: Seq[Double] = {
    // pmf(k) = e^-1 / k!: scanLeft from pmf(0), dividing by k
    val pmf = (1 to 5).scanLeft(math.exp(-1.0)) { case (p, k) => p / k }
    pmf.scanLeft(0.0)(_ + _).tail
  }

  /** Poisson(1) weight for uniform `u` ∈ [0,1): the CDF inversion. */
  def poissonWeight(u: Column): Column =
    PoissonCdf.zipWithIndex.foldRight(lit(6L): Column) {
      case ((cdf, k), rest) => when(u < cdf, k.toLong).otherwise(rest)
    }

  /** R replicate means of `valueCol` (one corpus pass) plus the
    * [α, 1−α] empirical CI. `keyCol` must be a stable row identity.
    * Output: ONE row (n BIGINT, mean, ci_lo, ci_hi — 6-dp doubles;
    * mean is the UNWEIGHTED exact mean, the point estimate).
    *
    * Degenerate-replicate discipline: a replicate whose Poisson
    * weights are ALL zero (probability e^−n per replicate — real for
    * tiny corpora) has no resample evidence; its 0/0 mean is nulled
    * via a zero-guarded divide and DROPPED before ranking rather than
    * letting NULL sort first and shift the order statistics. If so
    * many replicates drop that the upper rank is unreachable, or the
    * input frame is EMPTY, the output is ZERO rows (no CI is
    * representable) — callers needing a row-always contract should
    * pre-check corpus size (n ≥ ~30 makes a drop < 1e-11·R).
    */
  def meanCi(df: DataFrame, keyCol: Column, valueCol: Column,
      replicates: Int, alpha: Double): DataFrame = {
    require(replicates >= 4, s"need >= 4 replicates, got $replicates")
    require(alpha > 0 && alpha < 0.5, s"alpha in (0, 0.5), got $alpha")
    val lo = math.max(0, math.ceil(alpha * replicates).toInt - 1)
    val hi = math.min(replicates - 1, replicates - lo - 1)
    val reps = df.select(keyCol.as("_k"), valueCol.as("_v"),
        explode(array((0 until replicates).map(lit): _*)).as("r"))
      .select(col("r"), col("_v"),
        poissonWeight(
          (conv(substring(md5(concat_ws(":", col("_k"), col("r"))), 1, 12), 16, 10)
            .cast("double") + 0.5) / lit(281474976710656.0)).as("_w"))
      .groupBy("r")
      .agg((Exact.dsum(col("_v") * col("_w").cast("double"), scale = 9) /
        nullif(sum(col("_w")).cast("double"), lit(0.0))).as("_m"))
    // exact order statistics over the R-row replicate frame; all-zero-
    // weight replicates (null mean) carry no evidence and are dropped
    val ranked = reps.filter(col("_m").isNotNull).select(col("_m"),
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("_m"), col("r"))).as("_rk"))
    val ciLo = ranked.filter(col("_rk") === lo + 1).select(round(col("_m"), 6).as("ci_lo"))
    val ciHi = ranked.filter(col("_rk") === hi + 1).select(round(col("_m"), 6).as("ci_hi"))
    df.agg(count(lit(1)).as("n"),
        round(Exact.davg(valueCol, scale = 9), 6).as("mean"))
      .crossJoin(broadcast(ciLo))
      .crossJoin(broadcast(ciHi))
  }
}
