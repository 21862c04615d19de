package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar-attribute derivation (reference O11,
  * populate_from_json.py:510-513).
  *
  * The reference renders `year_week` as calendar-year + ISO-week, which
  * is wrong at year boundaries (SURVEY.md Q1: 2021-01-01 → '2021-53').
  * We implement the consistent rule — ISO year + ISO week — as decided
  * in SURVEY.md §5. No zero padding (matches the reference's f-string).
  *
  * All formats are pure Catalyst expressions (codegen'd, no UDFs).
  */
object Calendar {

  // English abbreviations rendered by indexing fixed arrays instead of
  // date_format pattern letters: locale-PROOF (pattern rendering can
  // follow the JVM default locale, and the DuckDB oracle's strftime
  // %b/%a is always English) and still pure codegen'd Catalyst.
  private val MonthNames: Column = array(Seq(
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec").map(lit): _*)
  private val DowNames: Column = array(Seq(
    "Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat").map(lit): _*)

  def yearWeek(d: Column): Column =
    concat(date_part(lit("YEAROFWEEK"), d), lit("-"), weekofyear(d))

  def yearMonth(d: Column): Column =
    concat(year(d), lit("-"), monthAbbrev(d))

  /** dayofweek() is 1=Sunday..7=Saturday. */
  def dayOfWeek(d: Column): Column = element_at(DowNames, dayofweek(d))

  def monthAbbrev(d: Column): Column = element_at(MonthNames, month(d))

  /** Adds the four calendar columns the reference stores on every fact
    * row (populate_from_json.py:463-470).
    */
  def withCalendarAttrs(df: DataFrame, dateCol: String): DataFrame = {
    val d = col(dateCol)
    df.withColumn("year_week", yearWeek(d))
      .withColumn("year_month", yearMonth(d))
      .withColumn("day_of_week", dayOfWeek(d))
      .withColumn("month", monthAbbrev(d))
  }
}
