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

  test("multi-query serving from the index equals the full-scan batch retriever") {
    val docs = corpus(70, 31)
    val path = tmp("invbatch")
    Retrieval.writeInvertedIndex(docs, "doc_id", "text", path, nBuckets = 8)
    val queries = Seq(
      0L -> Seq("spark", "join", "stream"),
      1L -> Seq("data", "row"),
      2L -> Seq("merge", "zzz_absent", "scan"))
    val full = Retrieval.bm25TopKBatch(docs, "doc_id", "text", queries, k = 12)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val served = Retrieval.bm25TopKBatchFromIndex(spark, path, "doc_id",
        queries, k = 12)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(served === full)
    assert(full.nonEmpty)
  }

  test("positional index: phrase counts equal direct m-gram counts, overlaps included") {
    val docs = Seq(
      (1L, "x alpha beta gamma y"),
      (2L, "alpha beta gamma alpha beta gamma"),
      (3L, "alpha beta delta"),
      (4L, "a a a a"),
      (5L, "beta gamma alpha")).toDF("doc_id", "text")
    val path = tmp("posidx")
    Retrieval.writePositionalIndex(docs, "doc_id", "text", path, nBuckets = 4)
    val r = Retrieval.phraseOccurrencesFromIndex(spark, path, "doc_id",
        Seq("alpha", "beta", "gamma")).orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r === Seq((1L, 1L), (2L, 2L)))
    // repeated-term phrase: "a a" over "a a a a" -> 3 OVERLAPPING hits
    val aa = Retrieval.phraseOccurrencesFromIndex(spark, path, "doc_id",
        Seq("a", "a")).collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(aa === Seq((4L, 3L)))
  }

  test("compaction is invisible to serving; stats merge to one row") {
    val docs = corpus(50, 37)
    val src = tmp("invcsrc")
    val dst = tmp("invcdst")
    Retrieval.writeInvertedIndex(docs.filter($"doc_id" % 2 === 0L),
      "doc_id", "text", src, nBuckets = 4)
    Retrieval.appendToInvertedIndex(docs.filter($"doc_id" % 2 =!= 0L),
      "doc_id", "text", src)
    Retrieval.compactInvertedIndex(spark, src, dst)
    val terms = Seq("spark", "data")
    val a = Retrieval.bm25TopKFromIndex(spark, src, "doc_id", terms, 15)
      .collect().map(_.toSeq).toSeq
    val b = Retrieval.bm25TopKFromIndex(spark, dst, "doc_id", terms, 15)
      .collect().map(_.toSeq).toSeq
    assert(b === a)
    assert(spark.read.parquet(s"$dst/stats").count() === 1L)
    val va = Retrieval.vocabularyFromIndex(spark, src, 10)
      .collect().map(_.toSeq).toSeq
    val vb = Retrieval.vocabularyFromIndex(spark, dst, 10)
      .collect().map(_.toSeq).toSeq
    assert(vb === va)
  }

  test("QL from index: hand-computed Dirichlet scores; absent terms keep background mass") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry kiwi zebra"),
      (3L, "plum plum plum")).toDF("doc_id", "text")
    val path = tmp("invql")
    Retrieval.writeInvertedIndex(docs, "doc_id", "text", path, nBuckets = 4)
    val out = Retrieval.qlTopKFromIndex(spark, path, "doc_id",
        Seq("apple", "banana"), k = 10, mu = 1000.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // C = 10 tokens; cf(apple) = 3, cf(banana) = 1
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def term(tf: Double, cf: Double, dl: Double) =
      math.log((tf + 1000.0 * cf / 10.0) / (dl + 1000.0))
    // doc 2 does NOT contain banana — its banana term is the
    // BACKGROUND probability, not zero (the per-doc-pivot bug class)
    val s1 = r6(term(2.0, 3.0, 3.0) + term(1.0, 1.0, 3.0))
    val s2 = r6(term(1.0, 3.0, 4.0) + term(0.0, 1.0, 4.0))
    assert(out === Seq((1L, 3L, s1), (2L, 4L, s2)))
    assert(s1 > s2)
  }

  test("proximity from positional index: min pair distance, window filter") {
    val docs = Seq(
      (1L, "alpha x y gamma"),        // dist 3 — outside window 2
      (2L, "alpha x gamma z alpha"),  // dists {2, 2} -> 2
      (3L, "gamma alpha"),            // dist 1 (order-free)
      (4L, "alpha only here")).toDF("doc_id", "text")
    val path = tmp("posprox")
    Retrieval.writePositionalIndex(docs, "doc_id", "text", path, nBuckets = 4)
    val r = Retrieval.proximityFromIndex(spark, path, "doc_id",
        "alpha", "gamma", window = 2).orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r === Seq((2L, 2L), (3L, 1L)))
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
