package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Watermarked STREAM-STREAM interval join — the continuously-
  * ingesting twin of [[graft.operators.RangeJoin.pointInInterval]]
  * (reference semantics: "events of kind A within a time window
  * preceding each event of kind B, same key" — attribution, funnel
  * and error-correlation queries over live event streams).
  *
  * Scale/state design: Spark plans this as a
  * StreamingSymmetricHashJoin — BOTH streams shuffle by the equi-key
  * only (the time-range predicate stays OUT of the partitioning, so
  * there is no bin fan-out on a stream), and each side buffers rows in
  * keyed state until the OTHER side's watermark passes the end of the
  * interval they could still join with. State is therefore bounded by
  * rows-per-(window + lateness) horizon, not stream length — the
  * watermark + explicit time-range condition are REQUIRED here
  * precisely because without both the engine cannot evict and state
  * grows unboundedly. Late rows beyond `lateness` are dropped on
  * ingest (the q60-family contract).
  *
  * Determinism: an INNER join's emitted SET is a pure function of the
  * input sets (only emission batching varies with arrival order), so
  * the whole operator gates against the batch theta-join oracle —
  * unlike aggregations, no sentinel row is needed to flush results.
  *
  * On batch frames degrades to the binned-equi-join batch operator
  * ([[RangeJoin.pointInInterval]]) with the same output columns.
  */
object StreamingJoin {

  /** Join each `point` row to every `interval` row with equal values
    * in `keys` and `point.tsCol` ∈ [interval.tsCol − window,
    * interval.tsCol]. Column sets of the two frames must be disjoint
    * apart from `keys` (standard stream-stream join constraint).
    *
    * @param windowSec  interval length, seconds (exclusive of lateness)
    * @param lateness   watermark delay for BOTH streams, e.g. "1 hour"
    */
  def pointInPrecedingWindow(
      point: DataFrame,
      interval: DataFrame,
      keys: Seq[String],
      pointTs: String,
      intervalTs: String,
      windowSec: Long,
      lateness: String = "1 hour"): DataFrame = {
    require(pointTs != intervalTs,
      "stream-stream join needs distinct timestamp column names")
    // mixed stream-static is NOT supported: a batch `point` with a
    // streaming `interval` would take the batch RangeJoin path and
    // apply explode/sequence binning to a streaming frame (runtime
    // failure with an unrelated error); a streaming `point` with a
    // batch `interval` would skip watermarking the static side without
    // the documented stream-stream state semantics. Fail at plan time
    // with the actual problem instead.
    require(point.isStreaming == interval.isStreaming,
      "pointInPrecedingWindow needs both frames streaming or both batch, got " +
        s"point.isStreaming=${point.isStreaming}, " +
        s"interval.isStreaming=${interval.isStreaming}")
    if (point.isStreaming) {
      val p = point.withWatermark(pointTs, lateness)
      val i = interval.withWatermark(intervalTs, lateness)
      val keyCond = keys.map(k => p(k) === i(k)).reduce(_ && _)
      val rangeCond =
        p.col(pointTs) >= i.col(intervalTs) - expr(s"INTERVAL $windowSec SECONDS") &&
        p.col(pointTs) <= i.col(intervalTs)
      // the equi-keys appear on both sides post-join; keep one copy
      keys.foldLeft(p.join(i, keyCond && rangeCond, "inner"))((df, k) => df.drop(i(k)))
    } else {
      val us = windowSec * 1000000L
      val pB = point.withColumn("_t", unix_micros(col(pointTs)))
      val iB = interval.withColumn("_lo", unix_micros(col(intervalTs)) - us)
        .withColumn("_hi", unix_micros(col(intervalTs)))
      RangeJoin.pointInInterval(pB, iB, keys, "_t", "_lo", "_hi", binWidth = us)
        .drop("_t", "_lo", "_hi")
    }
  }
}
