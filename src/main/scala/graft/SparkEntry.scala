package graft

import graft.core.Exact
import graft.operators.{Calendar, Ewma, Rolling, Spine}
import graft.queries.{Oracles, Queries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship slice (SURVEY.md §7.3): "daily training load with
    * fitness/fatigue/form and weekly strain, by activity" on `events`:
    * to_date(ts) → daily sum(value) per event_type → date-spine gap
    * fill → EWMA ctl/atl/tsb → rolling monotony/strain → calendar
    * attrs → orderBy. Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val daily = graft.core.Tables.events(spark, dir)
      .withColumn("d", to_date(col("ts")))
      .groupBy("d", "event_type")
      .agg(Exact.dsum(col("value")).as("tss"))
    val filled = Spine.gapFill(daily, "d", Seq("event_type"), Map("tss" -> 0.0))
    val ew = Ewma.withTrainingLoad(filled, "d", Seq("event_type"), Seq("tss" -> ""))
    val roll = Rolling.withMonotonyStrain(ew, "d", Seq("event_type"), Seq("tss" -> ""))
    Calendar.withCalendarAttrs(roll, "d")
      .select(col("event_type"), col("d"), col("year_week"),
        round(col("tss"), 6).as("tss"),
        round(col("ctl"), 6).as("ctl"), round(col("atl"), 6).as("atl"),
        round(col("tsb"), 6).as("tsb"),
        round(col("monotony"), 4).as("monotony"),
        round(col("strain"), 4).as("strain"))
      .orderBy("event_type", "d")
  }

  /** One entry per implemented operator from SURVEY.md §2 / §2.5. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** DuckDB oracle twins; queries absent here (engine-side hashing)
    * get the driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Oracles.all
}
