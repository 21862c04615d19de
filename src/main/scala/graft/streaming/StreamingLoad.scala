package graft.streaming

import graft.core.Exact
import graft.operators.Ewma
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming variant of the daily-load pipeline (SURVEY.md §2.4
  * "streaming" row — an extension beyond the reference's batch-only
  * surface): `readStream` → watermarked 1-day windowed aggregation →
  * incremental EWMA via `flatMapGroupsWithState`.
  *
  * Two chained stateful operators in one query are deliberately
  * avoided (finalization coupling is subtle); the intended deployment
  * is two queries with a day-grain sink between them:
  *
  *   events ─ dailyAggregate ─▶ daily parquet/Kafka ─ ewma ─▶ sink
  *
  * State per key is three doubles — O(#dim-combos) total, trivially
  * inside any state store at 100 TB event volume.
  */
object StreamingLoad {

  /** One row per (day, dims) once the watermark passes the day's end —
    * works on a streaming OR batch frame. Late events beyond
    * `lateness` are dropped by the watermark, matching the batch
    * pipeline's deterministic day totals.
    */
  def dailyAggregate(
      events: DataFrame,
      tsCol: String,
      dims: Seq[String],
      valueCol: String,
      lateness: String = "1 day"): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark(tsCol, lateness) else events
    wm.groupBy(window(col(tsCol), "1 day") +: dims.map(col): _*)
      .agg(Exact.dsum(col(valueCol)).as("tss"))
      .select(to_date(col(s"window.start")).as("date") +: dims.map(col) :+ col("tss"): _*)
  }

  case class DailyRow(key: String, epochDay: Long, tss: Double)
  case class EwmaState(lastEpochDay: Long, ctl: Double, atl: Double)
  case class EwmaRow(key: String, epochDay: Long, tss: Double,
      ctl: Double, atl: Double, tsb: Double)
  case class RollState(lastEpochDay: Long, window: Seq[Double])
  case class RollRow(key: String, epochDay: Long, tss: Double,
      monotony: Double, strain: Double)

  /** Incremental rolling monotony/strain (reference O13) over
    * day-grain rows: state is the trailing ≤7-day value window (gap
    * days enter as 0, like the batch pipeline's zero-filled spine).
    * Emits the same Q6 null discipline as `Rolling`: 1-row frame →
    * monotony = strain = 0; stddev clipped at 0.01.
    */
  def rollingStrain(daily: Dataset[DailyRow]): Dataset[RollRow] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[DailyRow], state: GroupState[RollState]) => {
          var st = state.getOption.getOrElse(RollState(Long.MinValue, Vector.empty))
          val out = rows.toSeq.sortBy(_.epochDay).iterator.flatMap { r =>
            if (r.epochDay <= st.lastEpochDay) Iterator.empty
            else {
              var w = st.window
              if (st.lastEpochDay != Long.MinValue) {
                var d = st.lastEpochDay + 1
                while (d < r.epochDay) { w = (w :+ 0.0).takeRight(7); d += 1 }
              }
              w = (w :+ r.tss).takeRight(7)
              st = RollState(r.epochDay, w)
              val n = w.length
              val mean = w.sum / n
              val (monotony, strain) =
                if (n < 2) (0.0, 0.0)
                else {
                  val variance = w.map(v => (v - mean) * (v - mean)).sum / (n - 1)
                  val sd = math.max(0.01, math.sqrt(variance))
                  val m = mean / sd
                  (m, w.sum * m)
                }
              Iterator.single(RollRow(key, r.epochDay, r.tss, monotony, strain))
            }
          }.toVector
          state.update(st)
          out.iterator
        })
  }

  /** Incremental EWMA over day-grain rows. Within a trigger batch a
    * key's rows fold in date order; gap days between the stored state
    * and an arriving row decay with tss=0 (the spine's zero-filled
    * days, applied lazily). Rows at or before the already-folded date
    * are late duplicates and are dropped — the upstream watermark
    * makes them impossible in the intended two-query deployment.
    */
  def ewma(daily: Dataset[DailyRow]): Dataset[EwmaRow] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[DailyRow], state: GroupState[EwmaState]) => {
          var st = state.getOption.getOrElse(EwmaState(Long.MinValue, 0.0, 0.0))
          val out = rows.toSeq.sortBy(_.epochDay).iterator.flatMap { r =>
            if (r.epochDay <= st.lastEpochDay) Iterator.empty
            else {
              // decay through zero-filled gap days
              var ctl = st.ctl
              var atl = st.atl
              if (st.lastEpochDay != Long.MinValue) {
                var d = st.lastEpochDay + 1
                while (d < r.epochDay) {
                  ctl *= Ewma.CtlDecay; atl *= Ewma.AtlDecay; d += 1
                }
              }
              ctl = r.tss * Ewma.CtlImpact + ctl * Ewma.CtlDecay
              atl = r.tss * Ewma.AtlImpact + atl * Ewma.AtlDecay
              st = EwmaState(r.epochDay, ctl, atl)
              Iterator.single(EwmaRow(key, r.epochDay, r.tss, ctl, atl, ctl - atl))
            }
          }.toVector
          state.update(st)
          out.iterator
        })
  }
}
