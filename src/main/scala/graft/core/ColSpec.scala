package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation method for a measure column (reference AggMethod,
  * populate_from_json.py:10-26).
  */
sealed trait AggMethod
object AggMethod {
  /** Plain additive sum. */
  case object Sum extends AggMethod
  /** Duration-weighted mean: sum(v·seconds)/sum(seconds) — how MEAN
    * columns combine same-day workouts (populate_from_json.py:406-423).
    */
  case object WeightedMean extends AggMethod
  /** Plain unweighted mean — how MEAN columns roll up across days in
    * the week/month tables (populate_from_json.py:545-547 uses AVG).
    */
  case object Mean extends AggMethod
  /** Booleans are summed then written 0/1 — effectively OR
    * (populate_from_json.py:41-43, 438-442).
    */
  case object BoolOr extends AggMethod
}

/** One declarative column spec, mirroring the reference's map entries
  * `{json key, db col, type, factor, default, AggMethod, Mapper}`
  * (populate_from_json.py:10-26) — but compiled to Catalyst Column
  * expressions instead of interpolated SQL strings.
  *
  * Lifecycle (matches the reference exactly):
  *  1. [[project]] — raw value × factor, UNROUNDED (the reference
  *     aggregates raw values and rounds once at write,
  *     populate_from_json.py:406-423 then 428-446);
  *  2. [[aggregate]] — combine same-key rows per [[AggMethod]];
  *  3. [[finalize]] — write-stage rounding/casting
  *     (`value_string_for_sql`, populate_from_json.py:428-446).
  *
  * @param jsonKey key in the input record (one key can fan out to many
  *                columns with different unit factors, e.g. km→km,miles)
  * @param col     output column name
  * @param dt      storage type (DoubleType / LongType / BooleanType)
  * @param factor  unit-conversion multiplier (populate_from_json.py:28-47)
  * @param default fill value for gap-filled rows (populate_from_json.py:50)
  * @param agg     how same-day workouts combine (O14)
  * @param mapper  derived-column expression computed AFTER aggregation
  *                (O15 mapper-after-aggregate, SURVEY.md Q4); receives the
  *                map of aggregated base columns
  */
final case class ColSpec(
    jsonKey: String,
    col: String,
    dt: DataType,
    factor: Double = 1.0,
    default: Any = 0,
    agg: AggMethod = AggMethod.Sum,
    mapper: Option[Map[String, Column] => Column] = None) {

  /** Unit-conversion projection, UNROUNDED (rounding happens once, in
    * [[finalize]] — rounding per input row before aggregation would
    * drift from the reference, e.g. two 90 s workouts must give
    * minutes=3, not round(1.5)+round(1.5)=4).
    */
  def project(raw: Column): Column = dt match {
    case DoubleType | LongType => raw.cast(DoubleType) * lit(factor)
    case BooleanType           => raw.cast(DoubleType) =!= 0.0
    case _                     => raw.cast(dt)
  }

  /** Aggregation over the projected (unrounded) column, weighted by
    * `weight` (the seconds column) for WeightedMean specs. MEAN+INTEGER
    * is truncated via int() in the reference (populate_from_json.py:417).
    */
  def aggregate(weight: Column): Column = {
    val c = column(col)
    agg match {
      case AggMethod.Sum  => Exact.dsum(c).as(col)
      case AggMethod.Mean => Exact.davg(c).as(col)
      case AggMethod.WeightedMean =>
        val m = Exact.weightedMean(c.cast(DoubleType), weight)
        (dt match {
          case LongType => m.cast(LongType).cast(DoubleType) // int() truncation
          case _        => m
        }).as(col)
      case AggMethod.BoolOr =>
        coalesce(max(c.cast(IntegerType)) > 0, lit(false)).as(col)
    }
  }

  /** Finest-grain partial aggregates for two-level grouping sets
    * (CubeFanout rolls the coarser sets up from the finest): decimal
    * accumulators STAY decimal between the levels, so the merge is
    * exactly associative and the merged result is bit-identical to the
    * single-phase [[aggregate]] — same values at any grouping, any
    * parallelism, any engine.
    */
  def partials(weight: Column): Seq[Column] = {
    val c = column(col)
    val dec = DecimalType(38, 6)
    agg match {
      case AggMethod.Sum =>
        Seq(sum(c.cast(dec)).as(s"_p_$col"))
      case AggMethod.Mean =>
        Seq(sum(c.cast(dec)).as(s"_p_$col"), count(c).as(s"_pc_$col"))
      case AggMethod.WeightedMean =>
        Seq(sum((c.cast(DoubleType) * weight).cast(dec)).as(s"_p_$col"),
          sum(weight.cast(dec)).as(s"_pw_$col"))
      case AggMethod.BoolOr =>
        Seq(max(c.cast(IntegerType)).as(s"_p_$col"))
    }
  }

  /** Merge of [[partials]] across fine-grain groups — the second-level
    * aggregate expression, producing exactly [[aggregate]]'s value.
    */
  def merge: Column = {
    val p = column(s"_p_$col")
    (agg match {
      case AggMethod.Sum  => sum(p).cast(DoubleType)
      case AggMethod.Mean => sum(p).cast(DoubleType) / sum(column(s"_pc_$col"))
      case AggMethod.WeightedMean =>
        val den = sum(column(s"_pw_$col")).cast(DoubleType)
        val m = coalesce(when(den =!= 0.0, sum(p).cast(DoubleType) / den), lit(0.0))
        dt match {
          case LongType => m.cast(LongType).cast(DoubleType) // int() truncation
          case _        => m
        }
      case AggMethod.BoolOr => coalesce(max(p) > 0, lit(false))
    }).as(col)
  }

  /** Write-stage rounding and casting (reference `value_string_for_sql`,
    * populate_from_json.py:428-446): REAL → round 2dp, INTEGER →
    * round 0dp then int, BOOLEAN → as-is (0/1 at the sink). Reference
    * Python round() is banker's → `bround` (SURVEY.md Q7).
    */
  def finalize(c: Column): Column = dt match {
    case DoubleType  => bround(c, 2)
    case LongType    => bround(c, 0).cast(LongType)
    case _           => c
  }

  private def column(name: String) = org.apache.spark.sql.functions.col(name)
}

/** The reference's four column maps, transcribed with their factors,
  * defaults and agg methods (populate_from_json.py:28-86).
  */
object DiarySpecs {
  import AggMethod._

  val Mi    = 0.621371   // km → miles       (populate_from_json.py:26)
  val Ft    = 3.28084    // metres → feet    (populate_from_json.py:39)
  val Lbs   = 2.20462    // kg → pounds      (populate_from_json.py:177)

  /** mph = km·0.621371·3600/seconds, 0 when seconds<=0
    * (populate_from_json.py:552-559). Computed AFTER aggregation from
    * the aggregated km/seconds (O15).
    */
  private def mph(a: Map[String, Column]): Column =
    when(a("seconds") > 0, bround(a("km") * Mi * 3600.0 / a("seconds"), 1))
      .otherwise(0.0)

  /** kph (populate_from_json.py:562-569). */
  private def kph(a: Map[String, Column]): Column =
    when(a("seconds") > 0, bround(a("km") * 3600.0 / a("seconds"), 1))
      .otherwise(0.0)

  /** rpe_tss = rpe²·seconds/(49·36) — RPE 7 for one hour ≡ 100 TSS
    * (populate_from_json.py:572-582). Uses the aggregated (weighted
    * mean) rpe and total seconds.
    */
  private def rpeTss(a: Map[String, Column]): Column =
    when(a("seconds") > 0,
      bround(a("rpe") * a("rpe") * a("seconds") / (49.0 * 36.0), 1))
      .otherwise(0.0)

  /** Workout measures (populate_from_json.py:28-50). AggMethods
    * transcribed exactly: mph/kph are MEAN (they matter only in the
    * week/month rollup — at day level the mapper recomputes them from
    * aggregates); rpe_tss is SUM.
    */
  val workoutMap: Seq[ColSpec] = Seq(
    ColSpec("km", "km", DoubleType, agg = Sum),
    ColSpec("km", "miles", DoubleType, factor = Mi, agg = Sum),
    ColSpec("tss", "tss", LongType, agg = Sum),
    ColSpec("rpe", "rpe", DoubleType, agg = WeightedMean),
    ColSpec("hr", "hr", LongType, agg = WeightedMean),
    ColSpec("watts", "watts", LongType, agg = WeightedMean),
    ColSpec("seconds", "seconds", LongType, agg = Sum),
    ColSpec("seconds", "minutes", LongType, factor = 1.0 / 60, agg = Sum),
    ColSpec("seconds", "hours", DoubleType, factor = 1.0 / 3600, agg = Sum),
    ColSpec("ascentMetres", "ascent_metres", LongType, agg = Sum),
    ColSpec("ascentMetres", "ascent_feet", LongType, factor = Ft, agg = Sum),
    ColSpec("kj", "kj", LongType, agg = Sum),
    ColSpec("reps", "reps", LongType, agg = Sum),
    ColSpec("isRace", "is_race", BooleanType, default = false, agg = BoolOr),
    ColSpec("brick", "brick", BooleanType, default = false, agg = BoolOr),
    ColSpec("wattsEstimated", "watts_estimated", BooleanType, default = false, agg = BoolOr),
    ColSpec("cadence", "cadence", LongType, agg = WeightedMean),
    ColSpec("rpe_tss", "rpe_tss", DoubleType, agg = Sum, mapper = Some(rpeTss)),
    ColSpec("mph", "mph", DoubleType, agg = Mean, mapper = Some(mph)),
    ColSpec("kph", "kph", DoubleType, agg = Mean, mapper = Some(kph)),
  )

  /** Day-level subjective metrics (populate_from_json.py:53-59).
    * fatigue/motivation are MEAN in the reference — they only aggregate
    * in the week/month rollup (plain AVG there); strings carry no
    * AggMethod and are excluded from rollups.
    */
  val dayMap: Seq[ColSpec] = Seq(
    ColSpec("fatigue", "fatigue", DoubleType, agg = Mean),
    ColSpec("motivation", "motivation", DoubleType, agg = Mean),
    ColSpec("sleep", "sleep_seconds", LongType, factor = 3600),
    ColSpec("sleep", "sleep_minutes", LongType, factor = 60),
    ColSpec("sleep", "sleep_hours", DoubleType),
    ColSpec("type", "day_type", StringType, default = "Normal"),
    ColSpec("sleepQuality", "sleep_quality", StringType, default = "Average"),
  )

  /** Physiological series (populate_from_json.py:78-86) — populated by
    * the interpolation pass (O20/O21), no AggMethod (excluded from
    * rollups, populate_from_json.py:537-549).
    */
  val physioMap: Seq[ColSpec] = Seq(
    ColSpec("kg", "kg", DoubleType),
    ColSpec("kg", "lbs", DoubleType, factor = Lbs),
    ColSpec("fatPercent", "fat_percentage", DoubleType),
    ColSpec("restingHR", "resting_hr", DoubleType),
    ColSpec("restingSDNN", "sdnn", DoubleType),
    ColSpec("restingRMSSD", "rmssd", DoubleType),
  )

  /** Post-pass outputs (populate_from_json.py:64-74), REAL DEFAULT 0,
    * all MEAN for rollup purposes.
    */
  val calculatedCols: Seq[String] = Seq(
    "ctl", "atl", "tsb", "rpe_ctl", "rpe_atl", "rpe_tsb",
    "monotony", "strain", "rpe_monotony", "rpe_strain")
}
