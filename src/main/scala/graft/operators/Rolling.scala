package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling 7-row monotony/strain (reference O13,
  * populate_from_json.py:285-302):
  *
  *   tss_stdev = rolling(7, min_periods=0).std().clip(lower=0.01)
  *   monotony  = rolling(7, min_periods=1).mean() / tss_stdev
  *   strain    = rolling(7, min_periods=1).sum() * monotony
  *   … then fillna(0)
  *
  * Pure window functions — whole-stage-codegen'd, one sort per distinct
  * (partition, order) which is shared with the EWMA pass upstream.
  *
  * Null discipline (SURVEY.md Q6): on a 1-row frame pandas std is NaN,
  * `clip` PROPAGATES NaN, so monotony/strain come out NaN → fillna(0).
  * Spark's `stddev_samp` yields null there but `greatest(0.01, null)`
  * SKIPS nulls (returns 0.01), so the clip must be guarded:
  * `when(count > 1, greatest(0.01, stddev)).otherwise(null)`, then
  * `coalesce(mean/stdev, 0)`.
  */
object Rolling {

  /** Appends `{prefix}monotony` / `{prefix}strain` for each
    * (srcCol, prefix) in `inputs`, over a 7-row date-ordered frame per
    * `keys` group.
    */
  def withMonotonyStrain(
      df: DataFrame,
      dateCol: String,
      keys: Seq[String],
      inputs: Seq[(String, String)] = Seq("tss" -> "", "rpe_tss" -> "rpe_")): DataFrame = {

    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
      .rowsBetween(-6, Window.currentRow)

    inputs.foldLeft(df) { case (acc, (src, p)) =>
      val c = col(src).cast("double")
      val cnt = count(c).over(w)
      // pandas std is sample stddev (ddof=1) — stddev_samp matches.
      val sd = when(cnt > 1, greatest(lit(0.01), stddev_samp(c).over(w)))
      val monotony = coalesce(avg(c).over(w) / sd, lit(0.0))
      acc
        .withColumn(s"${p}monotony", monotony)
        .withColumn(s"${p}strain", sum(c).over(w) * col(s"${p}monotony"))
    }
  }
}
