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

  test("ANN ingest helper: streamed appends ≡ batch appends, keys namespaced") {
    val root = tmp("sii_ann")
    val rnd = new scala.util.Random(41)
    val emb = (0L until 48L).map(i =>
        (i, Seq.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    graft.operators.Similarity.writeIvfPqIndex(
      emb.filter($"vec_id" < 32), emb.filter($"vec_id" < 8),
      "vec_id", "embedding", m = 2, dim = 8, s"$root/idx")
    emb.filter($"vec_id" >= 32).repartition(1)
      .write.mode("overwrite").parquet(s"$root/in")
    StreamingIndexIngest.startAnn(
      spark.readStream.schema(emb.schema).parquet(s"$root/in"),
      "vec_id", "embedding", s"$root/idx", s"$root/chk")
      .awaitTermination()
    graft.core.OpCache.release()
    // served ≡ an index built over the full corpus with the same model
    val q = emb.filter($"vec_id" < 4)
    val served = graft.operators.Similarity.pqIvfTopKFromIndex(
      q, s"$root/idx", "vec_id", "embedding", k = 3, nProbe = 8)
      .collect().map(_.toSeq).toSeq
    graft.operators.Similarity.writeIvfPqIndex(emb,
      emb.filter($"vec_id" < 8), "vec_id", "embedding", m = 2, dim = 8,
      s"$root/full")
    val full = graft.operators.Similarity.pqIvfTopKFromIndex(
      q, s"$root/full", "vec_id", "embedding", k = 3, nProbe = 8)
      .collect().map(_.toSeq).toSeq
    assert(served === full)
    assert(served.nonEmpty)
    val keys = spark.read.parquet(s"$root/idx/tombstones")
      .select("batch_key").distinct().as[String].collect()
    assert(keys.forall(_.startsWith("stream-")), keys.mkString(","))
  }

  test("ingest growth guard kills the stream loudly once the manifest crosses the bound") {
    val root = tmp("sii_guard")
    val docs = corpus(1, 30, 43)
    Retrieval.writeInvertedIndex(docs.filter($"doc_id" <= 10L),
      "doc_id", "text", s"$root/idx", nBuckets = 4)
    // 4 single-doc files → 4 micro-batches → 4 committed slices
    (11L to 14L).foreach { i =>
      docs.filter($"doc_id" === i).repartition(1)
        .write.mode("append").parquet(s"$root/in")
    }
    val q = StreamingIndexIngest.start(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in"),
      "doc_id", "text", s"$root/idx", s"$root/chk",
      maxCommittedSlices = 2)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    graft.core.OpCache.release()
    assert(e.getMessage.contains("needs compaction") ||
      String.valueOf(e.getCause).contains("needs compaction"), e.getMessage)
    // the failing batch COMMITTED before the guard fired — nothing lost
    assert(spark.read.parquet(s"$root/idx/tombstones")
      .select("slice").distinct().count() === 3L)
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
