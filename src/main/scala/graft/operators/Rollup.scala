package graft.operators

import graft.core.{AggMethod, ColSpec, Exact}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Week/month periodic rollup (reference O22,
  * populate_from_json.py:305-342, 537-549 — implemented there but
  * commented out of `__main__`; SURVEY.md declares it in scope).
  *
  * Per Day-period dim combo: GROUP BY year_week (or year_month) with
  * `MAX(date)` and, per ColSpec AggMethod, `SUM` for Sum columns and
  * **plain unweighted AVG** for Mean/WeightedMean columns
  * (populate_from_json.py:545-547 — NOT the duration-weighted mean the
  * daily aggregation uses). Gap-filled zero rows are included, exactly
  * as the reference's GROUP BY over the full day table includes them.
  *
  * Boolean (BoolOr) columns roll up as SUM of 0/1 — the reference maps
  * booleans as SUM (populate_from_json.py:41-43), so the weekly value
  * is a count (e.g. races that week).
  *
  * One shuffle on (dims, period key); partial aggregation collapses
  * map-side. Output cardinality = combos × weeks — tiny.
  */
object Rollup {

  /** @param periodKey  "year_week" or "year_month"
    * @param periodName "Week" or "Month" (written to the `period` col)
    */
  def periodic(
      day: DataFrame,
      periodKey: String,
      periodName: String,
      dims: Seq[String],
      dateCol: String,
      specs: Seq[ColSpec]): DataFrame = {

    val aggs: Seq[Column] = max(col(dateCol)).as(dateCol) +: specs.flatMap { s =>
      val c = col(s.col).cast("double")
      s.agg match {
        case AggMethod.Sum => Some(Exact.dsum(c).as(s.col))
        case AggMethod.Mean | AggMethod.WeightedMean => Some(Exact.davg(c).as(s.col))
        case AggMethod.BoolOr => Some(sum(col(s.col).cast("long")).as(s.col))
      }
    }
    day.groupBy((dims.map(col) :+ col(periodKey)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("period", lit(periodName))
  }
}
