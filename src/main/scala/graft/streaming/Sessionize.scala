package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization via Spark's native `session_window` —
  * the streaming twin of the batch lag-flag + running-sum form
  * (queries.Queries.q34Sessionize): a session closes after `gap` of
  * inactivity per key.
  *
  * On a stream the watermark both bounds state (open sessions per key
  * within the horizon) and finalizes a session once event time passes
  * its close + gap; on a batch frame the same expression computes the
  * identical sessions in one pass. State at 100 TB event volume is
  * O(open sessions), not O(events) — Spark merges events into the
  * open window as they arrive.
  */
object Sessionize {

  /** One row per (keys, session): event count, start, last event, and
    * duration in microseconds. `tsCol` must be a timestamp column.
    */
  def sessions(
      events: DataFrame,
      tsCol: String,
      keys: Seq[String],
      gap: String = "30 minutes",
      lateness: String = "1 hour"): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark(tsCol, lateness) else events
    wm.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("last_event"))
      .select(keys.map(col) :+ col("n_events") :+ col("session_start") :+
        col("last_event") :+
        (unix_micros(col("last_event")) - unix_micros(col("session_start")))
          .as("duration_us"): _*)
  }
}
