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

  // ── content-defined chunking ──

  /** Driver-side replay of the CDC fold: 31-bit poly fingerprint per
    * token, boundary when ≡ 0 mod divisor.
    */
  private def fp31(tok: String): Long = {
    var s = 0L
    var i = 0
    while (i < tok.length) {
      s += tok.charAt(i).toLong * ((i + 1) % 31 + 1)
      i += 1
    }
    s % 2147483647L
  }

  private def cdcRef(text: String, divisor: Int): Seq[String] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = scala.collection.mutable.ArrayBuffer.empty[String]
    for (t <- toks) {
      cur += t
      if (fp31(t) % divisor == 0) { out += cur.mkString(" "); cur.clear() }
    }
    if (cur.nonEmpty) out += cur.mkString(" ")
    out.toSeq
  }

  test("CDC: operator ≡ driver replay; cover and order preserved") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4,
      "x")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = Chunker.chunkContentDefined(df, "id", "text", divisor = 4)
      .orderBy("id", "chunk_idx")
      .select("id", "chunk").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for ((t, i) <- texts.zipWithIndex) {
      assert(got.getOrElse(i.toLong, Seq.empty) == cdcRef(t, 4),
        s"doc $i chunks diverge from replay")
      // reassembly: chunks joined give back the normalized token stream
      assert(got.getOrElse(i.toLong, Seq.empty).mkString(" ") ==
        t.split("\\s+").filter(_.nonEmpty).mkString(" "))
    }
  }

  test("CDC: shift-resistant — a dropped prefix leaves the tail chunks identical") {
    val body = (1 to 200).map(i => s"tok$i word$i item$i").mkString(" ")
    val orig = s"PREFIX $body"
    val edited = body
    val df = Seq((1L, orig), (2L, edited)).toDF("id", "text")
    val chunks = Chunker.chunkContentDefined(df, "id", "text", divisor = 8)
      .select("id", "chunk").as[(Long, String)].collect()
    val a = chunks.filter(_._1 == 1L).map(_._2).toSet
    val b = chunks.filter(_._1 == 2L).map(_._2).toSet
    val shared = a.intersect(b).size
    // all but the chunk containing the edited prefix must be shared
    assert(shared >= b.size - 1,
      s"CDC must share the unedited tail: shared $shared of ${b.size}")
    // fixed windows at the same mean size share (almost) nothing
    val fixed = Chunker.chunk(df, "id", "text", window = 8, stride = 8)
      .select("id", "chunk").as[(Long, String)].collect()
    val fa = fixed.filter(_._1 == 1L).map(_._2).toSet
    val fb = fixed.filter(_._1 == 2L).map(_._2).toSet
    assert(fa.intersect(fb).size <= 1,
      "fixed windows should be defeated by the one-token shift (sanity)")
  }

  test("CDC: expected chunk length tracks the divisor") {
    val text = (1 to 2000).map(i => s"w$i").mkString(" ")
    val out = Chunker.chunkContentDefined(Seq((1L, text)).toDF("id", "text"),
      "id", "text", divisor = 16)
      .agg(avg("n_tokens")).head().getDouble(0)
    assert(out > 8 && out < 32, s"mean chunk len $out far from divisor 16")
  }

  test("CDC: native kernel ≡ HOF fold on random texts (incl. unicode and empties)") {
    val rnd = new scala.util.Random(53)
    val pool = Seq("alpha", "βeta", "γ", "x", "longtokenvalue", "日本語", "z9")
    val texts = Seq.fill(40)(
      Seq.fill(rnd.nextInt(30))(pool(rnd.nextInt(pool.size))).mkString(" ")) ++
      Seq("", "   ", "single")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (div <- Seq(2, 4, 16)) {
      val both = df.select(
          Chunker.chunkArrayContentDefined(col("text"), div).as("hof"),
          graft.functions.ChunkExpressions.cdcChunks(col("text"), div).as("kernel"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"kernel diverges from HOF at divisor $div")
      }
    }
  }
}
