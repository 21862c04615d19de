package graft.streaming

import graft.SparkSpec
import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** Streaming crawl ingest: the idempotency keys are namespaced per
  * STREAM (ADVICE r19) — batch ids restart at 0 with every fresh
  * checkpoint, so a second backfill stream into the same index must
  * not find its early batches "already committed" by the first
  * stream's keys.
  */
class StreamingIndexIngestSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("spark", "join", "stream", "data", "row")

  private def corpus(lo: Long, hi: Long, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (lo to hi).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  test("two backfill streams (fresh checkpoints, batch ids both from 0) both land") {
    val root = tmp("sii_twostreams")
    val docs = corpus(1, 45, 5)
    Retrieval.writeInvertedIndex(docs.filter($"doc_id" <= 15L),
      "doc_id", "text", s"$root/idx", nBuckets = 4)
    // stream 1: docs 16-30
    docs.filter($"doc_id" > 15L && $"doc_id" <= 30L)
      .write.mode("overwrite").parquet(s"$root/in1")
    StreamingIndexIngest.start(
      spark.readStream.schema(docs.schema).parquet(s"$root/in1"),
      "doc_id", "text", s"$root/idx", s"$root/chk1")
      .awaitTermination()
    // stream 2: docs 31-45, ITS OWN checkpoint → its batchId also
    // starts at 0; before the per-stream namespacing this batch was
    // silently skipped as a "re-delivery" of stream 1's batch 0
    docs.filter($"doc_id" > 30L)
      .write.mode("overwrite").parquet(s"$root/in2")
    StreamingIndexIngest.start(
      spark.readStream.schema(docs.schema).parquet(s"$root/in2"),
      "doc_id", "text", s"$root/idx", s"$root/chk2")
      .awaitTermination()
    graft.core.OpCache.release()
    val served = Retrieval.bm25TopKFromIndex(spark, s"$root/idx",
      "doc_id", Seq("spark", "data"), k = 20).collect().map(_.toSeq).toSeq
    val full = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "data"), k = 20).collect().map(_.toSeq).toSeq
    assert(served === full)
    // both streams' keys are in the manifest, under distinct prefixes
    val keys = spark.read.parquet(s"$root/idx/tombstones")
      .select("batch_key").distinct().as[String].collect().toSet
    assert(keys.size === 2, s"expected 2 distinct stream keys, got $keys")
  }

  test("re-delivery within ONE stream still dedups (same checkpoint, same key)") {
    val root = tmp("sii_redeliver")
    val docs = corpus(1, 30, 17)
    Retrieval.writeInvertedIndex(docs.filter($"doc_id" <= 15L),
      "doc_id", "text", s"$root/idx", nBuckets = 4)
    docs.filter($"doc_id" > 15L)
      .write.mode("overwrite").parquet(s"$root/in")
    def run(): Unit = StreamingIndexIngest.start(
      spark.readStream.schema(docs.schema).parquet(s"$root/in"),
      "doc_id", "text", s"$root/idx", s"$root/chk").awaitTermination()
    run()
    val statsAfter = spark.read.parquet(s"$root/idx/stats").count()
    // a restart over the SAME drained checkpoint re-offers nothing —
    // and even a hand-replayed batch with the same key is skipped
    run()
    graft.core.OpCache.release()
    assert(spark.read.parquet(s"$root/idx/stats").count() === statsAfter)
  }
}
