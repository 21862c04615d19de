package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TrainingDiary JSON source (reference O1/O2,
  * populate_from_json.py:111-127, 151-236): one nested document with
  * `days[]` (each optionally holding `workouts[]`), `weights[]` and
  * `physiologicals[]`.
  *
  * The schema is explicit (no inference pass — at 100 TB schema
  * inference is a full extra scan); nested arrays flatten via
  * `explode` / `explode_outer`.
  */
object DiarySource {

  val workoutType: StructType = StructType(Seq(
    StructField("activityString", StringType),
    StructField("activityTypeString", StringType),
    StructField("equipmentName", StringType),
    StructField("km", DoubleType),
    StructField("tss", DoubleType),
    StructField("rpe", DoubleType),
    StructField("hr", DoubleType),
    StructField("watts", DoubleType),
    StructField("seconds", DoubleType),
    StructField("ascentMetres", DoubleType),
    StructField("kj", DoubleType),
    StructField("reps", DoubleType),
    StructField("isRace", DoubleType),
    StructField("brick", DoubleType),
    StructField("wattsEstimated", DoubleType),
    StructField("cadence", DoubleType),
  ))

  val dayType: StructType = StructType(Seq(
    StructField("iso8061DateString", StringType),
    StructField("type", StringType),
    StructField("fatigue", DoubleType),
    StructField("motivation", DoubleType),
    StructField("sleep", DoubleType),
    StructField("sleepQuality", StringType),
    StructField("workouts", ArrayType(workoutType)),
  ))

  val schema: StructType = StructType(Seq(
    StructField("days", ArrayType(dayType)),
    StructField("weights", ArrayType(StructType(Seq(
      StructField("iso8061DateString", StringType),
      StructField("kg", DoubleType),
      StructField("fatPercent", DoubleType),
    )))),
    StructField("physiologicals", ArrayType(StructType(Seq(
      StructField("iso8061DateString", StringType),
      StructField("restingHR", DoubleType),
      StructField("restingSDNN", DoubleType),
      StructField("restingRMSSD", DoubleType),
    )))),
  ))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).option("multiLine", "true").json(path)

  /** One row per day: date + day-level attributes + workouts array. */
  def days(diary: DataFrame): DataFrame = daysWithOrd(diary).drop("_ord")

  /** [[days]] plus `_ord`, the day's position in the source array —
    * the tiebreak for first-wins dedup (reference O18: `date UNIQUE` +
    * swallowed insert errors keep the FIRST day per date,
    * populate_from_json.py:465, 531-535).
    */
  def daysWithOrd(diary: DataFrame): DataFrame =
    diary.select(posexplode(col("days")).as(Seq("_ord", "day")))
      .select(
        col("_ord"),
        to_date(to_timestamp(col("day.iso8061DateString"))).as("date"),
        col("day.type").as("day_type_raw"),
        col("day.fatigue").as("fatigue_raw"),
        col("day.motivation").as("motivation_raw"),
        col("day.sleep").as("sleep_raw"),
        col("day.sleepQuality").as("sleep_quality_raw"),
        col("day.workouts").as("workouts"))

  /** One row per workout (days without workouts drop out here — they
    * re-enter via the date spine).
    */
  def workouts(days: DataFrame): DataFrame =
    days.select(col("date"), explode(col("workouts")).as("w"))
      .select(col("date"), col("w.*"))

  /** Sparse weight series (reference filters kg>0 / fat>0 AFTER 1dp
    * rounding, populate_from_json.py:156-167).
    */
  def weights(diary: DataFrame): DataFrame =
    diary.select(explode(col("weights")).as("x"))
      .select(
        to_date(to_timestamp(col("x.iso8061DateString"))).as("date"),
        bround(col("x.kg"), 1).as("kg"),
        bround(col("x.fatPercent"), 1).as("fat_percentage"))

  /** Sparse physiological series. Reference bug Q3 (rmssd series built
    * from sdnn values, populate_from_json.py:213) is fixed: rmssd from
    * rmssd.
    */
  def physiologicals(diary: DataFrame): DataFrame =
    diary.select(explode(col("physiologicals")).as("x"))
      .select(
        to_date(to_timestamp(col("x.iso8061DateString"))).as("date"),
        floor(coalesce(col("x.restingHR"), lit(0.0))).cast("double").as("resting_hr"),
        bround(coalesce(col("x.restingSDNN"), lit(0.0)), 1).as("sdnn"),
        bround(coalesce(col("x.restingRMSSD"), lit(0.0)), 1).as("rmssd"))
}
