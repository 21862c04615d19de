package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("windows, stride overlap, tail handling, and cover") {
    // 7 tokens, window 3, stride 2 → starts 0,2,4: the window at 4
    // already reaches the end, so no start-6 subset chunk ("g" ⊂ "e f g")
    val df = Seq((1L, "a b c d e f g")).toDF("id", "text")
    val out = Chunker.chunk(df, "id", "text", window = 3, stride = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk", "n_tokens")
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq(
      (0L, "a b c", 3L), (1L, "c d e", 3L), (2L, "e f g", 3L)))
    // cover: every token appears in ≥1 chunk
    val covered = out.flatMap(_._2.split(" ")).toSet
    assert(covered === Set("a", "b", "c", "d", "e", "f", "g"))
    // a genuinely short tail IS emitted: 8 tokens → start 6 holds "g h"
    val out8 = Chunker.chunk(Seq((1L, "a b c d e f g h")).toDF("id", "text"),
        "id", "text", window = 3, stride = 2)
      .orderBy("chunk_idx").select("chunk").as[String].collect().toSeq
    assert(out8 === Seq("a b c", "c d e", "e f g", "g h"))
  }

  test("no chunk is a subset of its predecessor (the q83 window/stride)") {
    // 30 tokens at window 32 / stride 24: ONE chunk, not a chunk plus
    // its tokens-25..30 subset
    val toks = (1 to 30).map(i => s"t$i").mkString(" ")
    val out = Chunker.chunk(Seq((1L, toks)).toDF("id", "text"),
        "id", "text", window = 32, stride = 24)
      .select("chunk").as[String].collect().toSeq
    assert(out === Seq(toks))
  }

  test("doc shorter than one window yields exactly one chunk; empty doc none") {
    val df = Seq((1L, "x y"), (2L, ""), (3L, "   ")).toDF("id", "text")
    val out = Chunker.chunk(df, "id", "text", window = 10, stride = 10)
      .select("id", "chunk").as[(Long, String)].collect().toSeq
    assert(out === Seq((1L, "x y")))
  }

  test("non-overlapping stride == window partitions the tokens exactly") {
    val toks = (1 to 25).map(i => s"t$i")
    val df = Seq((1L, toks.mkString(" "))).toDF("id", "text")
    val out = Chunker.chunk(df, "id", "text", window = 10, stride = 10)
      .orderBy("chunk_idx").select("chunk").as[String].collect().toSeq
    assert(out.flatMap(_.split(" ")) === toks) // concatenation rebuilds the doc
    assert(out.map(_.split(" ").length) === Seq(10, 10, 5))
  }

  test("chunking is shuffle-free") {
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val plan = Chunker.chunk(df, "id", "text", 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("invalid window/stride rejected") {
    intercept[IllegalArgumentException] { Chunker.chunkArray(lit("a"), 0, 1) }
    intercept[IllegalArgumentException] { Chunker.chunkArray(lit("a"), 4, 5) }
    intercept[IllegalArgumentException] { Chunker.chunkArray(lit("a"), 4, 0) }
  }
}
