package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Date-spine gap fill (reference O17/O19,
  * populate_from_json.py:132-135, 449-454).
  *
  * The reference probes every existing fact table per day and inserts a
  * defaults-only row when missing. Spark-native: build the min..max day
  * spine once, cross-join it with the distinct dimension combos, and
  * left-join the facts. Per SURVEY.md Q2 we backfill the FULL spine for
  * every combo (the reference misses days before a combo first appears).
  *
  * Scale: the spine is tiny (years × 365 rows) and the dim-combo set is
  * small relative to facts, so the spine side broadcasts; the only
  * shuffle is the one the left join would need anyway, and with a
  * broadcast spine there is none.
  */
object Spine {

  /** One row per day between min and max of `dateCol` (inclusive). */
  def fromData(df: DataFrame, dateCol: String): DataFrame =
    df.agg(min(col(dateCol)).as("d0"), max(col(dateCol)).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as(dateCol))

  /** Full spine × dim-combos, left-joined with facts; missing measure
    * rows get `fillDefaults` (reference inserts workout zeroes,
    * populate_from_json.py:50).
    */
  def gapFill(
      facts: DataFrame,
      dateCol: String,
      dims: Seq[String],
      fillDefaults: Map[String, Any]): DataFrame = {
    val spine = fromData(facts, dateCol)
    val combos = facts.select(dims.map(col): _*).distinct()
    val full = broadcast(spine).crossJoin(broadcast(combos))
    full.join(facts, Seq(dateCol) ++ dims, "left").na.fill(fillDefaults)
  }
}
