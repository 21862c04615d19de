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
  * SQLite table. Spark-native this is one GROUPING SETS aggregate —
  * the Expand physical node emits one row per grouping set per input
  * row, then ONE shuffle aggregates all of them together. Absent dims
  * are pinned to 'All' (populate_from_json.py:363-372).
  *
  * `date` is a real grouping key in EVERY set, so we use explicit
  * grouping sets (2^|dims| of them, date pinned) rather than
  * `cube(date, dims…)` + post-filter — the latter expands 2^(|dims|+1)
  * rows per input and discards half AFTER the partial aggregate, a 2×
  * shuffle tax on the hottest operator at scale.
  *
  * Scale notes: Expand multiplies rows 2^|dims| before the exchange,
  * but partial (map-side) aggregation collapses them before the
  * shuffle, so network cost is bounded by the number of OUTPUT groups,
  * not 8× input rows. AQE handles runtime skew.
  */
object CubeFanout {

  /** The 'All' marker the reference uses for aggregated dims. */
  val All = "All"

  /** All subsets of `dims`, largest first (matches the reference's
    * aggregation_keys order, populate_from_json.py:346-354 — order is
    * irrelevant to semantics, the 8 sets are disjoint outputs).
    */
  private def subsets[A](xs: Seq[A]): Seq[Seq[A]] =
    xs.foldRight(Seq(Seq.empty[A]))((x, acc) => acc.map(x +: _) ++ acc)

  /** groupBy GROUPING SETS {(date) × subsets(dims)}, aggregating per
    * ColSpec, then computing mapper columns from the aggregated values
    * (SURVEY.md Q4: mappers run on aggregate inputs, NOT summed
    * per-row).
    *
    * @param weightCol the weighting column for WeightedMean specs
    *                  (the reference weights by `seconds`)
    * @param notSetFilter dim → raw values dropped only when the dim is
    *                  NOT aggregated (reference O10a: equipment
    *                  'Not Set'/'' rows are excluded from
    *                  equipment-bearing groupings only,
    *                  populate_from_json.py:391-392). Applied
    *                  post-aggregation — exact, because a grouping-set
    *                  output row only aggregates inputs sharing its
    *                  non-aggregated dim values.
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

    // Two-level rollup-from-finest: the finest grouping set
    // (date, d1…dn) IS a plain groupBy, and every coarser set derives
    // from its partials (decimal accumulators stay decimal between the
    // levels — exactly associative, so values are bit-identical to a
    // single-phase GROUPING SETS). The Expand node therefore multiplies
    // |finest groups| rows by 2^|dims|, not |input| rows — at 100 TB
    // that's the difference between expanding a bounded aggregate
    // (days × dim-combos) and expanding the whole fact table 8×.
    val partialAggs = plain.flatMap(_.partials(weight))
    val fine = df.groupBy((dateCol +: dims).map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)

    // grouping() is only legal inside the aggregate list — materialize
    // the per-dim flags there, filter on them afterwards, then drop.
    val gFlags = dims.map(d => grouping(col(d)).as(s"_g_$d"))
    val aggs = gFlags ++ plain.map(_.merge)

    val sets: Seq[Seq[Column]] =
      subsets(dims).map(s => col(dateCol) +: s.map(col))
    val cubed = fine
      .groupingSets(sets, col(dateCol) +: dims.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

    // Post-cube Not-Set filter (O10a).
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
    withMappers.drop(dims.map(d => s"_g_$d"): _*)
  }

  /** Write-stage rounding for a cubed frame (reference
    * `value_string_for_sql` applied at INSERT, populate_from_json.py:428-446).
    */
  def finalizeAll(df: DataFrame, specs: Seq[ColSpec]): DataFrame =
    specs.foldLeft(df)((acc, s) => acc.withColumn(s.col, s.finalize(col(s.col))))
}
