package graft

import graft.core.Exact
import graft.operators.{Calendar, Ewma, Interpolate, Rolling, Spine}
import graft.queries.{Oracles, Queries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship slice (SURVEY.md §7.3): "daily training load with
    * fitness/fatigue/form and weekly strain, by activity" on `events`:
    * to_date(ts) → grouping-sets daily load per event_type (+ the
    * 'All' roll-up cell) → date-spine gap fill → EWMA ctl/atl/tsb →
    * rolling monotony/strain → interpolated physio-style series
    * broadcast by date → calendar attrs → orderBy. One Expand + two
    * exchanges end-to-end. Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.core.Tables.events(spark, dir)
      .withColumn("d", to_date(col("ts")))
    val daily = ev
      .groupingSets(Seq(Seq(col("d"), col("event_type")), Seq(col("d"))),
        col("d"), col("event_type"))
      .agg(Exact.dsum(col("value")).as("tss"))
      .withColumn("event_type", coalesce(col("event_type"), lit("All")))
    val filled = Spine.gapFill(daily, "d", Seq("event_type"), Map("tss" -> 0.0))
    val ew = Rolling.withMonotonyStrain(filled, "d", Seq("event_type"), Seq("tss" -> ""))
    val roll = Ewma.withTrainingLoadSorted(ew, "d", Seq("event_type"), Seq("tss" -> ""))
    val obs = ev.filter(col("event_type") === "click")
      .groupBy("d").agg(Exact.davg(col("value")).as("load_index"))
      .filter(dayofmonth(col("d")) % 7 === 3)
    val series = Interpolate.onto(Spine.fromData(ev.select("d"), "d"), obs, "d", Seq("load_index"))
      .select(col("d"), round(coalesce(col("load_index"), lit(0.0)), 4).as("load_index"))
    Calendar.withCalendarAttrs(Interpolate.joinByDate(roll, series, "d"), "d")
      .select(col("event_type"), col("d"), col("year_week"),
        round(col("tss"), 6).as("tss"),
        round(col("ctl"), 6).as("ctl"), round(col("atl"), 6).as("atl"),
        round(col("tsb"), 6).as("tsb"),
        round(col("monotony"), 4).as("monotony"),
        round(col("strain"), 4).as("strain"),
        col("load_index"))
      .orderBy("event_type", "d")
  }

  /** One entry per implemented operator from SURVEY.md §2 / §2.5. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** DuckDB oracle twins; queries absent here (engine-side hashing)
    * get the driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Oracles.all
}
