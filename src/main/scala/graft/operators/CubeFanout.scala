package graft.operators

import graft.core.ColSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cube fan-out with weighted-mean / bool-or aggregation and
  * mapper-after-aggregate semantics (reference O14/O15/O16,
  * populate_from_json.py:345-425).
  *
  * The reference hand-rolls all 2³ subsets of
  * {activity, activity_type, equipment} and stores each in its own
  * SQLite table. Spark-native this is exactly one `cube()` — the
  * Expand physical node emits the 2^|dims| grouping-set rows per input
  * row, then ONE shuffle aggregates all of them together. Absent dims
  * are pinned to 'All' (populate_from_json.py:363-372).
  *
  * Scale notes: Expand multiplies rows 2^|dims| before the exchange,
  * but partial (map-side) aggregation collapses them before the
  * shuffle, so network cost is bounded by the number of OUTPUT groups,
  * not 8× input rows. AQE handles runtime skew.
  */
object CubeFanout {

  /** The 'All' marker the reference uses for aggregated dims. */
  val All = "All"

  /** groupBy date × cube(dims), aggregating per ColSpec, then computing
    * mapper columns from the aggregated values (SURVEY.md Q4: mappers
    * run on aggregate inputs, NOT summed per-row).
    *
    * @param weightCol the weighting column for WeightedMean specs
    *                  (the reference weights by `seconds`)
    * @param notSetFilter dim → raw values dropped only when the dim is
    *                  NOT aggregated (reference O10a: equipment
    *                  'Not Set'/'' rows are excluded from
    *                  equipment-bearing groupings only,
    *                  populate_from_json.py:391-392)
    */
  def dailyCube(
      df: DataFrame,
      dateCol: String,
      dims: Seq[String],
      specs: Seq[ColSpec],
      weightCol: String,
      notSetFilter: Map[String, Seq[String]] = Map.empty): DataFrame = {

    val weight = col(weightCol)
    val (mapped, plain) = specs.partition(_.mapper.isDefined)
    // grouping() is only legal inside the aggregate list — materialize
    // the per-dim flags there, filter on them afterwards, then drop.
    val gFlags = (dateCol +: dims).map(d => grouping(col(d)).as(s"_g_$d"))
    val aggs = gFlags ++ plain.map(_.aggregate(weight))

    val cubed = df
      .cube(col(dateCol) +: dims.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      // date is a real grouping key, never 'All': keep only grouping
      // sets where date is concrete.
      .filter(col(s"_g_$dateCol") === 0)

    // Post-cube Not-Set filter (O10a). Exact because a cube output row
    // only aggregates inputs sharing its non-aggregated dim values.
    val filtered = notSetFilter.foldLeft(cubed) { case (acc, (dim, bad)) =>
      acc.filter(!(col(s"_g_$dim") === 0 && col(dim).isin(bad: _*)))
    }

    // Aggregated dims render as 'All' (populate_from_json.py:363-372).
    val withAll = dims.foldLeft(filtered) { (acc, d) =>
      acc.withColumn(d, when(col(s"_g_$d") === 1, All).otherwise(col(d)))
    }

    // Mapper-after-aggregate (O15): derived columns computed from the
    // aggregated base columns.
    val baseCols: Map[String, Column] =
      plain.map(s => s.col -> col(s.col)).toMap
    val withMappers = mapped.foldLeft(withAll) { (acc, s) =>
      acc.withColumn(s.col, s.mapper.get(baseCols))
    }
    withMappers.drop((dateCol +: dims).map(d => s"_g_$d"): _*)
  }
}
