package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Date-spine gap fill (reference O17/O19,
  * populate_from_json.py:132-135, 449-454).
  *
  * The reference probes every existing fact table per day and inserts a
  * defaults-only row when missing. Spark-native: build the min..max day
  * spine once, cross-join it with the distinct dimension combos, and
  * UNION in the missing rows. Per SURVEY.md Q2 we backfill the FULL
  * spine for every combo (the reference misses days before a combo
  * first appears).
  *
  * Scale shape: gap fill as `facts ∪ missing` — the missing keys come
  * from a KEY-ONLY anti-join (spine×combos vs the facts' key
  * projection), and a union costs nothing. The tempting alternative —
  * an outer join of facts against spine×combos — cannot broadcast its
  * preserved side (an outer join only builds the non-preserved side),
  * so it silently degrades to a sort-merge join that exchanges and
  * sorts every WIDE fact row; the union shape moves only narrow key
  * tuples through the one shuffle it needs.
  *
  * Precondition: facts are unique per (dateCol, dims) — true by
  * construction for any post-aggregation frame.
  */
object Spine {

  /** One row per day between min and max of `dateCol` (inclusive). */
  def fromData(df: DataFrame, dateCol: String): DataFrame =
    df.agg(min(col(dateCol)).as("d0"), max(col(dateCol)).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as(dateCol))

  /** Full spine × dim-combos with facts' measures where present and
    * `fillDefaults` on gap rows.
    *
    * @param dayValues day-level attributes keyed by `dateCol` (fatigue,
    *                  sleep, day_type…). The reference writes the day's
    *                  ACTUAL values onto gap rows (populate_from_json.py:
    *                  133-135 inserts d_values), not defaults — pass the
    *                  per-date day frame and its columns are (re)joined
    *                  onto every row by date (broadcast: one row per
    *                  day). Day attrs are constant per date across all
    *                  cube cells, so this is exact.
    * @param spineFrom  frame whose `dateCol` min/max bounds the spine
    *                   (defaults to `facts`; pass the day frame when
    *                   workout-less days extend the range)
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

    val keyCols = dateCol +: dims
    val spine = fromData(spineFrom.getOrElse(facts).select(col(dateCol)), dateCol)
    val own = facts.select(dims.map(col): _*)
    val combos = extraCombos.fold(own)(own.unionByName(_)).distinct()
    val full = spine.crossJoin(combos)

    // key-only anti-join: which (date, dims) cells have no fact row
    val missingKeys = full.join(facts.select(keyCols.map(col): _*), keyCols, "left_anti")
    // pad to the facts schema with nulls (na.fill supplies defaults)
    val measureCols = facts.schema.fields.filterNot(f => keyCols.contains(f.name))
    val gapRows = missingKeys.select(
      keyCols.map(col) ++ measureCols.map(f => lit(null).cast(f.dataType).as(f.name)): _*)

    val unioned = facts.unionByName(gapRows)
    val withDay = dayValues match {
      case None => unioned
      case Some(day) =>
        val dayCols = day.columns.toIndexedSeq.filterNot(_ == dateCol)
        unioned.drop(dayCols: _*).join(broadcast(day), Seq(dateCol), "left")
    }
    withDay.na.fill(fillDefaults)
  }
}
