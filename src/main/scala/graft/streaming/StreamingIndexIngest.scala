package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING CRAWL INGEST into a stored inverted index — the write
  * half of the 100 TB lexical serving story (the read half is
  * q219/q223/q224): documents arrive as a stream (a crawler's
  * output), and every micro-batch becomes ONE append generation of
  * `Retrieval.appendToInvertedIndex`, re-ingested ids superseding
  * their stale postings exactly as in the batch path (q231).
  *
  * Exactly-once, spelled out (the q202 idempotency discipline, append
  * edition — an appending sink cannot use per-batchId OVERWRITE
  * directories, so it uses the index's slice-commit protocol
  * instead):
  *
  *  - Re-delivery of a COMMITTED batch: Structured Streaming re-runs
  *    a batchId only until its foreachBatch returns; on restart the
  *    same batchId may be offered again, and the append SKIPS it
  *    because its `batchKey` is already in the commit manifest.
  *  - A crash MID-APPEND (postings written, manifest not): the
  *    orphan rows carry a slice nonce that never reached the
  *    manifest, so serving never sees them; the re-run appends the
  *    same docs under a fresh nonce and commits.
  *
  * Ordering: micro-batches execute sequentially, so generations are
  * monotone in batchId and a doc re-crawled in a LATER batch
  * supersedes its earlier ingest — cross-batch re-ingest is the
  * supported path; ids must be unique within one batch (the q179
  * delta contract).
  *
  * The caller owns the base index (`writeInvertedIndex` — possibly
  * over an empty frame for a from-scratch crawl) and the checkpoint
  * location; concurrent writers outside this stream are not
  * supported (single-writer, the usual lakehouse-lite caveat — and
  * since r20 enforced LOUDLY: every commit re-reads the manifest and
  * raises if a foreign slice shares its generation).
  */
object StreamingIndexIngest {

  /** Start ingesting `docsStream(idCol, textCol)` into the index at
    * `path`. `trigger` defaults to AvailableNow (drain-and-stop, the
    * batch-backfill shape); pass a processing-time trigger for a
    * long-running crawl.
    *
    * `streamId` NAMESPACES the idempotency keys (ADVICE r19): batch
    * ids restart at 0 with every fresh checkpoint, so a SECOND
    * backfill stream into the same index would otherwise find its
    * early batches already "committed" by the first stream's keys
    * and silently skip them. Default = a stable hash of the
    * checkpoint path — re-deliveries of the SAME stream (same
    * checkpoint) still dedup, distinct streams never collide; pass
    * an explicit id when the checkpoint path itself is rotated but
    * the stream is logically the same. MIGRATION (pre-r20
    * checkpoints): the legacy layout keyed batches `stream-<id>`
    * un-namespaced — resuming such a checkpoint under a default
    * streamId would re-apply an interrupted-but-committed batch as a
    * duplicate generation (serving stays correct via supersede, but
    * the manifest inflates); pass `streamId = "stream"` to reproduce
    * the legacy keys for that resume.
    */
  def start(docsStream: DataFrame, idCol: String, textCol: String,
      path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      streamId: String = null,
      maxCommittedSlices: Long = Long.MaxValue,
      maxTombstonedIds: Long = Long.MaxValue): StreamingQuery =
    ingest(checkpoint, streamId, trigger, docsStream) { (batch, key) =>
      graft.operators.Retrieval.appendToInvertedIndex(
        batch, idCol, textCol, path, batchKey = key)
      guard(batch, path, maxCommittedSlices, maxTombstonedIds)
    }

  /** [[start]] for the stored IVF-PQ index — the ANN twin (q238
    * gates it): each micro-batch of vectors is one
    * `Similarity.appendToIvfPqIndex` generation, encoded against the
    * index's frozen books/cells, with the same slice-commit
    * exactly-once story and the same per-stream key namespace.
    */
  def startAnn(vecStream: DataFrame, idCol: String, vecCol: String,
      path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      streamId: String = null,
      maxCommittedSlices: Long = Long.MaxValue,
      maxTombstonedIds: Long = Long.MaxValue): StreamingQuery =
    ingest(checkpoint, streamId, trigger, vecStream) { (batch, key) =>
      graft.operators.Similarity.appendToIvfPqIndex(
        batch, path, idCol, vecCol, batchKey = key)
      guard(batch, path, maxCommittedSlices, maxTombstonedIds)
    }

  private def ingest(checkpoint: String, streamId: String,
      trigger: Trigger, stream: DataFrame)(
      append: (DataFrame, String) => Unit): StreamingQuery = {
    val sid = Option(streamId).getOrElse("stream-" +
      java.util.UUID.nameUUIDFromBytes(checkpoint.getBytes("UTF-8"))
        .toString.take(8))
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        append(batch, s"$sid-$batchId")
        graft.core.OpCache.release()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** The manifest growth guard, run AFTER each batch's commit (the
    * failing batch is safely committed — a restart skips it via its
    * batchKey and fails again until the operator compacts to a fresh
    * path and re-points the stream; see `IndexHealth`). Defaults are
    * ∞ = no guard, no extra manifest read.
    */
  private def guard(batch: DataFrame, path: String,
      maxSlices: Long, maxIds: Long): Unit =
    if (maxSlices != Long.MaxValue || maxIds != Long.MaxValue)
      graft.operators.IndexHealth.requireHealthy(
        batch.sparkSession, path, maxSlices, maxIds)
}
