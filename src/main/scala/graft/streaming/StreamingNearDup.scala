package graft.streaming

import graft.operators.NearDup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[NearDup.incrementalNearDupPairs]]'s
  * delta×history path — the continuous-crawl deployment: documents
  * arrive on a stream and must be flagged against a STORED LSH band
  * index of the 100 TB history WITHOUT re-shingling that history.
  * (Delta×delta pairs are the batch operator's job at each index
  * ingest; the stream's contract is "is this new doc a near-dup of
  * anything already indexed".)
  *
  * Stream/state design:
  *  - shingle → minhash → band hashing is per-row projection work —
  *    stateless, map-side, no shuffle of the stream.
  *  - candidate generation is a stream-STATIC inner join on the
  *    8-byte (band, band_hash) key against the stored index. Band
  *    hashing is shared bit-for-bit with the index builder
  *    ([[NearDup.bandHashes]]) — a stored index is only joinable if
  *    every future producer hashes identically.
  *  - the only STATE is `dropDuplicatesWithinWatermark` on the
  *    candidate pair (two docs can collide in several bands; the pair
  *    must verify once): keyed by two 8-byte ids, expired by the
  *    watermark — bounded by candidates-per-horizon, not stream
  *    length.
  *  - verification joins the static history text and recomputes
  *    Jaccard exactly. The delta's shingle array RIDES THROUGH the
  *    band explode (×bands copies) — the price of single-pass
  *    streaming; the batch operator instead re-joins its persisted
  *    shingle frame, which a stream cannot reference. The static
  *    history side cannot be semi-join-pruned by stream contents
  *    (no dynamic filters across the stream-static boundary), so
  *    production keeps a precomputed SHINGLE table beside the band
  *    index — the storage-for-scan trade the scaladoc of the batch
  *    operator already makes for bands.
  *
  * Emission is in-batch (the pair dedup holds back only repeats), so
  * bounded runs skip the no-data flush batch. On a batch `delta`
  * degrades to the equivalent batch plan with `distinct()` in place
  * of watermark state — spec-tested equal.
  */
object StreamingNearDup {

  /** Near-dup pairs (id_a, id_b, jaccard) between stream documents
    * and the indexed history. `bandState`/`historyText` are static;
    * ids in the delta must be disjoint from indexed ids (re-crawl
    * superseding is the batch operator's territory — a stream cannot
    * anti-join itself against its own future).
    */
  def againstIndex(
      delta: DataFrame,
      bandState: DataFrame,
      historyText: DataFrame,
      idCol: String,
      tsCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      lateness: String = "1 day"): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be a multiple of bands ($bands); " +
        "otherwise trailing signature elements are excluded from every band")
    require(!bandState.isStreaming && !historyText.isStreaming,
      "bandState and historyText are the STORED side and must be batch frames")

    def banded(df: DataFrame): DataFrame = df
      .select(col(idCol).as("_did"), col(tsCol),
        NearDup.shingles(col(textCol), n).as("_sha"))
      .select(col("_did"), col(tsCol), col("_sha"),
        posexplode(NearDup.bandHashes(
          NearDup.minhashSignature(col("_sha"), numHashes), bands))
          .as(Seq("band", "band_hash")))

    def verified(cand: DataFrame): DataFrame = {
      val hSh = historyText.select(col(idCol).as("_hid2"),
        NearDup.shingles(col(textCol), n).as("_shb"))
      cand.join(hSh, col("_hid") === col("_hid2"))
        .withColumn("jaccard", NearDup.jaccard(col("_sha"), col("_shb")))
        .filter(col("jaccard") >= threshold)
        .select(least(col("_did"), col("_hid")).as("id_a"),
          greatest(col("_did"), col("_hid")).as("id_b"), col("jaccard"))
    }

    val state = bandState.select(col(idCol).as("_hid"), col("band"), col("band_hash"))
    if (delta.isStreaming) {
      val cand = banded(delta.withWatermark(tsCol, lateness))
        .join(state, Seq("band", "band_hash"))
        .filter(col("_did") =!= col("_hid"))
        .dropDuplicatesWithinWatermark("_did", "_hid")
      verified(cand)
    } else {
      val cand = banded(delta)
        .join(state, Seq("band", "band_hash"))
        .filter(col("_did") =!= col("_hid"))
        // batch parity for the watermark pair-dedup: one row per pair,
        // deterministic representative (min ts, then any shingle copy —
        // all copies of a pair carry the same _sha by construction)
        .groupBy("_did", "_hid")
        .agg(first(col("_sha")).as("_sha"))
      verified(cand)
    }
  }
}
