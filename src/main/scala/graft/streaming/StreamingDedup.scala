package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the dedup operators (reference O18 first-wins and
  * the LLM-pipeline exact content dedup, `graft.operators.Dedup`) —
  * the shape a continuously-ingesting training-data pipeline needs:
  * documents arrive on a stream and each distinct content hash must be
  * emitted exactly once.
  *
  * State design for 100 TB streams: `dropDuplicatesWithinWatermark`
  * keys the state store by the 32-byte sha2 digest only (never the
  * document body), and the watermark expires entries once event time
  * passes the horizon — so state is bounded by distinct-hashes-per-
  * horizon, not by stream length. Exactness across the WHOLE stream
  * (no horizon) is the batch operator's job; the two compose as
  * stream-dedup-within-horizon → periodic batch `Dedup.exactByHash`
  * compaction, the standard lambda-free layout.
  */
object StreamingDedup {

  /** One row per distinct `sha2(contentCol)` within the watermark
    * horizon. On a streaming frame the FIRST-ARRIVED row wins (state
    * insertion order); on a batch frame this degrades to the
    * deterministic first-wins by `tsCol` — same output whenever the
    * stream delivers in event-time order.
    */
  def exactByHash(
      df: DataFrame,
      tsCol: String,
      contentCol: String,
      lateness: String = "1 day"): DataFrame =
    if (df.isStreaming)
      df.withColumn("_h", sha2(col(contentCol), 256))
        .withWatermark(tsCol, lateness)
        .dropDuplicatesWithinWatermark("_h")
        .drop("_h")
    else
      Dedup.exactByHash(df, contentCol, Seq(col(tsCol)))
}
