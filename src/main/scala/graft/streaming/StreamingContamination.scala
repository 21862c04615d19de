package graft.streaming

import graft.operators.{Dedup, NearDup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.Dedup.contamination]] — the
  * continuously-ingesting shape: documents arrive on a stream and any
  * doc containing an exact n-token window from a STATIC benchmark/eval
  * set must be flagged (then quarantined before training).
  *
  * Scale/state design: the benchmark window-hash set is model-sized
  * and static, so the match is a stream-static broadcast SEMI-join —
  * stateless, evaluated per micro-batch with no shuffle of stream
  * windows. The only stateful operator is the per-doc-id dedup of the
  * flag (a doc with 5 matching windows must be emitted once), keyed by
  * the 8-byte doc id and expired by the watermark — state is bounded
  * by contaminated-docs-per-horizon, not stream length.
  */
object StreamingContamination {

  /** Ids of stream documents containing ≥1 benchmark window, each id
    * emitted once per watermark horizon. On a batch frame degrades to
    * the batch operator's id set (with `tsCol` carried through).
    */
  def contaminatedIds(
      df: DataFrame,
      idCol: String,
      tsCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      windowTokens: Int,
      lateness: String = "1 day"): DataFrame = {
    val benchWins = benchmark
      .select(explode(NearDup.shingles(col(benchTextCol), windowTokens)).as("_win"))
      .select(xxhash64(col("_win")).as("_wh"))
      .distinct()
    if (df.isStreaming)
      df.withWatermark(tsCol, lateness)
        .select(col(tsCol), col(idCol),
          explode(NearDup.shingles(col(textCol), windowTokens)).as("_win"))
        .select(col(tsCol), col(idCol), xxhash64(col("_win")).as("_wh"))
        .join(broadcast(benchWins), Seq("_wh"), "left_semi")
        .dropDuplicatesWithinWatermark(idCol)
        .select(idCol, tsCol)
    else
      // emit-once parity with the streaming branch: a batch frame with
      // duplicate ids must still yield ONE row per contaminated id, so
      // the ts join-back aggregates to the id's earliest timestamp
      // (deterministic, unlike dropDuplicates' arbitrary row; the
      // streaming side keeps the first ARRIVED ts, which is inherently
      // arrival-order-dependent — min is the reproducible batch analog)
      Dedup.contamination(df, idCol, textCol, benchmark, benchTextCol, windowTokens)
        .join(df.groupBy(idCol).agg(min(col(tsCol)).as(tsCol)), idCol)
        .select(idCol, tsCol)
  }
}
