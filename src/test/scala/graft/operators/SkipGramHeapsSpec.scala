package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SkipGram.pairCounts and CorpusStats.heapsFit. */
class SkipGramHeapsSpec extends SparkSpec {
  import spark.implicits._

  test("skip-gram window ±2: every in-range neighbor pairs, nothing else") {
    val df = Seq("a b c d").toDF("text")
    val pairs = SkipGram.pairCounts(df, "text", window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // a: b,c ; b: a,c,d ; c: a,b,d ; d: b,c
    val expect = Map(
      ("a", "b") -> 1L, ("a", "c") -> 1L,
      ("b", "a") -> 1L, ("b", "c") -> 1L, ("b", "d") -> 1L,
      ("c", "a") -> 1L, ("c", "b") -> 1L, ("c", "d") -> 1L,
      ("d", "b") -> 1L, ("d", "c") -> 1L)
    assert(pairs === expect)
  }

  test("skip-gram counts accumulate across docs and repeats") {
    val df = Seq("x y x", "x y").toDF("text")
    val pairs = SkipGram.pairCounts(df, "text", window = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc1: (x,y),(y,x),(y,x),(x,y); doc2: (x,y),(y,x)
    assert(pairs(("x", "y")) === 3L)
    assert(pairs(("y", "x")) === 3L)
  }

  test("heaps fit recovers a growing-vocabulary exponent") {
    // each doc introduces one new word beside common filler: V(n) ~ n
    val docs = (1L to 200L).map(i =>
      (i, s"the of and unique$i")).toDF("doc_id", "text")
    val r = CorpusStats.heapsFit(docs, "doc_id", "text", 10).head()
    val slope = r.getDouble(1)
    assert(slope > 0.8 && slope <= 1.05, s"slope $slope")
    assert(r.getDouble(3) > 0.95, s"r2 ${r.getDouble(3)}")
  }

  test("saturated vocabulary degenerates gracefully: slope 0, null r2") {
    val docs = (1L to 100L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val r = CorpusStats.heapsFit(docs, "doc_id", "text", 10).head()
    assert(r.getDouble(1) === 0.0)
    assert(r.isNullAt(3))
  }

  test("heaps fit: empty corpus fails loudly; int ids are tolerated") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      CorpusStats.heapsFit(empty, "doc_id", "text", 10).head()
    }
    assert(e.getMessage.contains("empty corpus"), e.getMessage)
    // INTEGER id column (not BIGINT): no ClassCastException
    val intIds = (1 to 120).map(i => (i, s"the of unique$i")).toDF("doc_id", "text")
    val r = CorpusStats.heapsFit(intIds, "doc_id", "text", 10).head()
    assert(r.getLong(0) >= 3L)
  }
}
