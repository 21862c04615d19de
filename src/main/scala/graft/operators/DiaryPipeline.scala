package graft.operators

import graft.core.DiarySpecs
import graft.sources.DiarySource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.OpCache.TrackedPersist

/** The full training-diary warehouse build — the reference's three
  * entry points (`populate`, `calculate_all_tsb`,
  * `calculate_all_strain`, populate_from_json.py:584-598) as ONE
  * declarative plan over ONE DataFrame.
  *
  * The reference's 100+ `{period}_{activity}_{type}_{equipment}`
  * SQLite tables collapse into dimension columns
  * (activity, activity_type, equipment; 'All' = aggregated), so a
  * "table" is a filter and the catalog is `select(dims).distinct()`.
  *
  * Stage order matches the reference exactly: project (factor only) →
  * cube-aggregate → mapper-after-aggregate → write-stage rounding →
  * full-spine gap fill carrying real day values → EWMA → rolling
  * stats → interpolated physio broadcast-joined by date.
  *
  * Shuffle budget at scale: one exchange for the grouping-sets
  * aggregate, one for the EWMA groupByKey (reused by the rolling
  * window sort — same (dims, date) clustering), zero for the spine
  * (broadcast right-outer) and physio (broadcast) joins.
  */
object DiaryPipeline {

  val Dims = Seq("activity", "activity_type", "equipment")

  def build(spark: SparkSession, path: String): DataFrame = {
    val diary = DiarySource.read(spark, path).cache()
    // first day per date wins (reference O18: `date UNIQUE` + swallowed
    // insert errors); the source-array ordinal is the deterministic
    // tiebreak, so duplicate-date entries never reach the cube or the
    // dayVals broadcast join
    val days = Dedup.firstWins(DiarySource.daysWithOrd(diary),
      Seq("date"), Seq(col("_ord"))).drop("_ord")
    val workouts = DiarySource.workouts(days)

    // per-workout projection: dims + ColSpec factor projections
    val specs = DiarySpecs.workoutMap
    val projected = workouts.select(
      col("date") +:
        col("activityString").as("activity") +:
        col("activityTypeString").as("activity_type") +:
        col("equipmentName").as("equipment") +:
        col("seconds").as("_w") +:
        specs.filter(_.mapper.isEmpty).map(s => s.project(col(s.jsonKey)).as(s.col)): _*)

    // cube fan-out with weighted means + Not-Set equipment filter
    val cubed = CubeFanout.dailyCube(projected, "date", Dims, specs, "_w",
      notSetFilter = Map("equipment" -> Seq("Not Set", "")))
      // table names strip spaces from equipment (populate_from_json.py:372)
      .withColumn("equipment", regexp_replace(col("equipment"), " ", ""))

    // write-stage rounding (value_string_for_sql) BEFORE the time-series
    // passes: the reference computes EWMA/rolling on STORED values.
    // Persisted: the spine stage reads this frame TWICE (facts side +
    // dim-combo enumeration) — without the persist the whole
    // scan→project→cube subtree would execute twice, a full second
    // aggregation of the fact table at 100 TB. The cube output is
    // bounded by days × combos, far smaller than its input.
    val finalized = CubeFanout.finalizeAll(cubed, specs)
      .persistTracked

    // day-level values rendered once per date (rounded at write)
    val dayVals = days.select(
      col("date"),
      bround(col("fatigue_raw"), 2).as("fatigue"),
      bround(col("motivation_raw"), 2).as("motivation"),
      bround(col("sleep_raw") * 3600, 0).cast("long").as("sleep_seconds"),
      bround(col("sleep_raw") * 60, 0).cast("long").as("sleep_minutes"),
      bround(col("sleep_raw"), 2).as("sleep_hours"),
      coalesce(col("day_type_raw"), lit("Normal")).as("day_type"),
      coalesce(col("sleep_quality_raw"), lit("Average")).as("sleep_quality"))

    // full-spine gap fill (SURVEY Q2: supersets the reference's
    // partial fill); spine spans ALL diary days, and the all-'All'
    // cell exists even for a workout-less diary
    val allCombo = spark.sql("SELECT 'All' AS activity, 'All' AS activity_type, 'All' AS equipment")
    val workoutDefaults: Map[String, Any] =
      specs.map(s => s.col -> (s.dt match {
        case org.apache.spark.sql.types.BooleanType => false
        case org.apache.spark.sql.types.LongType => 0L
        case _ => 0.0
      })).toMap
    val filled = Spine.gapFill(finalized, "date", Dims, workoutDefaults,
      dayValues = Some(dayVals), spineFrom = Some(days), extraCombos = Some(allCombo))

    // time-series passes over every cell's date series: the rolling
    // WINDOW runs first (one exchange + sort on (dims, date)), then
    // the EWMA fold streams over the layout the window left behind —
    // zero additional shuffles (Ewma.withTrainingLoadSorted)
    val rolled = Rolling.withMonotonyStrain(filled, "date", Dims,
      Seq("tss" -> "", "rpe_tss" -> "rpe_"))
    val ewma = Ewma.withTrainingLoadSorted(rolled, "date", Dims,
      Seq("tss" -> "", "rpe_tss" -> "rpe_"))

    // interpolated physio series, broadcast onto every cell by date
    val spine = Spine.fromData(days.select("date"), "date")
    val w = DiarySource.weights(diary)
    val kgInterp = Interpolate.onto(spine,
      w.filter(col("kg") > 0).select("date", "kg"), "date", Seq("kg"))
    val fatInterp = Interpolate.onto(spine,
      w.filter(col("fat_percentage") > 0).select("date", "fat_percentage"),
      "date", Seq("fat_percentage"))
    val p = DiarySource.physiologicals(diary)
    val hrInterp = Interpolate.onto(spine,
      p.filter(col("resting_hr") > 0).select("date", "resting_hr"), "date", Seq("resting_hr"))
    val sdnnInterp = Interpolate.onto(spine,
      p.filter(col("sdnn") > 0).select("date", "sdnn"), "date", Seq("sdnn"))
    val rmssdInterp = Interpolate.onto(spine,
      p.filter(col("rmssd") > 0).select("date", "rmssd"), "date", Seq("rmssd"))
    val physio = Seq(fatInterp, hrInterp, sdnnInterp, rmssdInterp)
      .foldLeft(kgInterp)((acc, s) => acc.join(s, Seq("date")))
      .select(
        col("date"),
        bround(coalesce(col("kg"), lit(0.0)), 1).as("kg"),
        // lbs from the UNROUNDED interpolated kg (populate_from_json.py:177)
        bround(coalesce(col("kg"), lit(0.0)) * DiarySpecs.Lbs, 1).as("lbs"),
        bround(coalesce(col("fat_percentage"), lit(0.0)), 1).as("fat_percentage"),
        coalesce(col("resting_hr"), lit(0.0)).as("resting_hr"),
        bround(coalesce(col("sdnn"), lit(0.0)), 1).as("sdnn"),
        bround(coalesce(col("rmssd"), lit(0.0)), 1).as("rmssd"))

    val withPhysio = Interpolate.joinByDate(ewma, physio, "date")
    Calendar.withCalendarAttrs(withPhysio, "date")
      .withColumn("period", lit("Day"))
  }

  /** Week/month rollup of the Day warehouse (reference O22,
    * populate_from_json.py:305-342): SUM columns sum, MEAN columns
    * plain-average (NOT duration-weighted), booleans count, strings and
    * physio columns are excluded (no AggMethod). Calculated columns
    * (ctl…strain) roll up as plain AVG per the reference's map.
    */
  def rollup(warehouse: DataFrame, period: String): DataFrame = {
    import graft.core.{AggMethod, ColSpec}
    import org.apache.spark.sql.types.DoubleType
    val key = if (period == "Week") "year_week" else "year_month"
    val calcSpecs = DiarySpecs.calculatedCols.map(c =>
      ColSpec(c, c, DoubleType, agg = AggMethod.Mean))
    val daySpecs = DiarySpecs.dayMap.filter(s =>
      s.col != "day_type" && s.col != "sleep_quality")
    val specs = DiarySpecs.workoutMap ++ daySpecs ++ calcSpecs
    Rollup.periodic(warehouse.filter(col("period") === "Day"),
      key, period, Dims, "date", specs)
  }

  /** The reference's `Tables` metadata catalog (create_db.py:9-16),
    * derived instead of stored.
    */
  def catalog(warehouse: DataFrame): DataFrame =
    warehouse.select(col("period") +: Dims.map(col): _*).distinct()

  /** Partitioned parquet sink (reference O3's INSERT loop,
    * populate_from_json.py:515-535). Partitioning by the two
    * highest-selectivity dims gives partition pruning for the
    * "one cell" access pattern the reference's table-per-cell layout
    * optimized for.
    */
  def write(warehouse: DataFrame, path: String): Unit =
    warehouse.write
      .partitionBy("period", "activity")
      .mode("overwrite")
      .parquet(path)
}
