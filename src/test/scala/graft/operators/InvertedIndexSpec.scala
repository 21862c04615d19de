package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stored BM25 inverted index: serving ≡ the from-scratch scan
  * bit-for-bit, incremental append ≡ full rebuild, empty-delta
  * no-op.
  */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("spark", "join", "stream", "data", "row",
    "table", "merge", "scan", "batch", "key")

  private def corpus(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    ((1L to n.toLong).map { i =>
      (i, Seq.fill(2 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    } ++ Seq((900L, ""), (901L, "zzz only unknown tokens here")))
      .toDF("doc_id", "text")
  }

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString + "/idx"

  test("serving from the index is bit-identical to the full BM25 scan") {
    val docs = corpus(80, 19)
    val path = tmp("invidx")
    Retrieval.writeInvertedIndex(docs, "doc_id", "text", path, nBuckets = 8)
    val terms = Seq("spark", "join", "zzz_absent", "stream")
    val full = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 25)
      .collect().map(_.toSeq).toSeq
    val served = Retrieval.bm25TopKFromIndex(spark, path, "doc_id",
      terms, k = 25).collect().map(_.toSeq).toSeq
    assert(served === full)
    assert(full.nonEmpty)
  }

  test("append ≡ rebuild: base+delta serving equals the full-corpus scan") {
    val docs = corpus(60, 23)
    val base = docs.filter($"doc_id" % 3 =!= 0L)
    val delta = docs.filter($"doc_id" % 3 === 0L)
    val path = tmp("invappend")
    Retrieval.writeInvertedIndex(base, "doc_id", "text", path, nBuckets = 8)
    Retrieval.appendToInvertedIndex(delta, "doc_id", "text", path)
    val terms = Seq("data", "table", "merge")
    val full = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 15)
      .collect().map(_.toSeq).toSeq
    val served = Retrieval.bm25TopKFromIndex(spark, path, "doc_id",
      terms, k = 15).collect().map(_.toSeq).toSeq
    assert(served === full)
    // N/avgdl really are the merged values: the stats sidecar holds
    // one row per slice and serving sums them
    assert(spark.read.parquet(s"$path/stats").count() === 2L)
  }

  test("empty delta is a no-op: no stats row, scores unchanged") {
    val docs = corpus(30, 29)
    val path = tmp("invempty")
    Retrieval.writeInvertedIndex(docs, "doc_id", "text", path, nBuckets = 4)
    val before = Retrieval.bm25TopKFromIndex(spark, path, "doc_id",
      Seq("spark", "row"), k = 10).collect().map(_.toSeq).toSeq
    Retrieval.appendToInvertedIndex(docs.filter($"doc_id" < 0L),
      "doc_id", "text", path)
    val after = Retrieval.bm25TopKFromIndex(spark, path, "doc_id",
      Seq("spark", "row"), k = 10).collect().map(_.toSeq).toSeq
    assert(after === before)
    assert(spark.read.parquet(s"$path/stats").count() === 1L)
  }
}
