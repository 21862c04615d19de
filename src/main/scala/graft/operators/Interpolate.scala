package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear interpolation of sparse date series (reference O20,
  * populate_from_json.py:151-236: pandas
  * `reindex(date_range(min,max)).interpolate(method='linear')`).
  *
  * Spark-native as-of construction: for each spine day, the previous
  * and next observations come from `last(v, ignoreNulls)` over an
  * unbounded-preceding frame and `first(v, ignoreNulls)` over an
  * unbounded-following frame; then
  *
  *   interp = prev + (next − prev) · (d − prevD) / (nextD − prevD)
  *
  * Edge semantics (pandas default `limit_direction='forward'`):
  * BEFORE the first observation → null (reference writes 0 at the
  * sink); AFTER the last observation → held (ffill). Exact at
  * observations.
  *
  * Scale: per-series work is two window passes sharing one sort. With
  * `keys` empty (the reference's single-athlete case) the window is
  * unpartitioned — fine for a tiny physio series; at 100 TB pass the
  * athlete/entity id in `keys` and every series interpolates in
  * parallel.
  */
object Interpolate {

  /** Interpolates each of `valueCols` from `obs` onto `spine`
    * (one row per day per key). `obs` rows with null values are
    * treated as absent.
    */
  def onto(
      spine: DataFrame,
      obs: DataFrame,
      dateCol: String,
      valueCols: Seq[String],
      keys: Seq[String] = Nil): DataFrame = {

    val joined = spine.join(obs, Seq(dateCol) ++ keys, "left")
    val d = col(dateCol)
    val wPrev = Window.partitionBy(keys.map(col): _*).orderBy(d)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keys.map(col): _*).orderBy(d)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    valueCols.foldLeft(joined) { (acc, vc) =>
      val v = col(vc).cast("double")
      val prevV = last(v, ignoreNulls = true).over(wPrev)
      val prevD = last(when(v.isNotNull, d), ignoreNulls = true).over(wPrev)
      val nextV = first(v, ignoreNulls = true).over(wNext)
      val nextD = first(when(v.isNotNull, d), ignoreNulls = true).over(wNext)
      val interp: Column =
        when(v.isNotNull, v)
          .when(prevV.isNotNull && nextV.isNotNull,
            prevV + (nextV - prevV) *
              datediff(d, prevD).cast("double") / datediff(nextD, prevD).cast("double"))
          .when(prevV.isNotNull, prevV) // after last obs: held (ffill)
          .otherwise(lit(null))         // before first obs: null (0 at sink)
      acc.withColumn(vc, interp)
    }
  }

  /** Broadcast the (tiny) interpolated per-date series onto every row
    * of the cube frame (reference O21: the same interpolated values are
    * UPDATEd into every fact table by date,
    * populate_from_json.py:173-184, 221-236).
    */
  def joinByDate(cube: DataFrame, series: DataFrame, dateCol: String): DataFrame =
    cube.join(broadcast(series), Seq(dateCol), "left")
}
