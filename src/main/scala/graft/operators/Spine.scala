package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Date-spine gap fill (reference O17/O19,
  * populate_from_json.py:132-135, 449-454).
  *
  * The reference probes every existing fact table per day and inserts a
  * defaults-only row when missing. Spark-native: build the min..max day
  * spine once, cross-join it with the distinct dimension combos, and
  * outer-join the facts. Per SURVEY.md Q2 we backfill the FULL spine for
  * every combo (the reference misses days before a combo first appears).
  *
  * Scale: the spine is tiny (years × 365 rows) and the dim-combo set is
  * small relative to facts, so spine × combos broadcasts. The join is
  * written `facts RIGHT OUTER broadcast(spine×combos)` — a right outer
  * join builds its LEFT side, so the broadcast is legal and the big
  * facts side streams with NO shuffle at all.
  */
object Spine {

  /** One row per day between min and max of `dateCol` (inclusive). */
  def fromData(df: DataFrame, dateCol: String): DataFrame =
    df.agg(min(col(dateCol)).as("d0"), max(col(dateCol)).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as(dateCol))

  /** Full spine × dim-combos, outer-joined with facts; missing measure
    * rows get `fillDefaults` (reference inserts workout zeroes,
    * populate_from_json.py:50, 132-135).
    *
    * @param dayValues day-level attributes keyed by `dateCol` (fatigue,
    *                  sleep, day_type…). The reference writes the day's
    *                  ACTUAL values onto gap rows (populate_from_json.py:
    *                  133-135 inserts d_values), not defaults — pass the
    *                  per-date day frame and its columns are (re)joined
    *                  onto every row by date. Day attrs are constant per
    *                  date across all cube cells, so this is exact.
    */
  /** @param spineFrom  frame whose `dateCol` min/max bounds the spine
    *                    (defaults to `facts`; pass the day frame when
    *                    workout-less days extend the range)
    * @param extraCombos dim combinations that must exist even with no
    *                    facts (e.g. the all-'All' cell when a diary has
    *                    days but no workouts at all)
    */
  def gapFill(
      facts: DataFrame,
      dateCol: String,
      dims: Seq[String],
      fillDefaults: Map[String, Any],
      dayValues: Option[DataFrame] = None,
      spineFrom: Option[DataFrame] = None,
      extraCombos: Option[DataFrame] = None): DataFrame = {
    val spine = fromData(spineFrom.getOrElse(facts).select(col(dateCol)), dateCol)
    val own = facts.select(dims.map(col): _*)
    val combos = extraCombos.fold(own)(own.unionByName(_)).distinct()
    val full = spine.crossJoin(combos)
    val joined = facts.join(broadcast(full), Seq(dateCol) ++ dims, "right")
    val filled = dayValues match {
      case None => joined
      case Some(day) =>
        val dayCols = day.columns.filterNot(_ == dateCol)
        joined.drop(dayCols: _*).join(broadcast(day), Seq(dateCol), "left")
    }
    filled.na.fill(fillDefaults)
  }
}
