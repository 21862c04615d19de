package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ExactSubstr span removal: kernel edge cases plus the construction
  * property VERDICT r13 asked for — cleaned docs contain zero
  * duplicated windows at the operator's own granularity (every
  * duplicated window position loses ≥ 1 covered token).
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4

  private def run(rows: Seq[(Long, String)]) =
    ExactSubstr.removeDuplicatedSpans(
      rows.toDF("doc_id", "text"), "doc_id", "text", windowTokens = K)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long)]
      .collect()

  test("dup-free corpus passes through with zero removal stats") {
    val out = run(Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six")))
    assert(out === Seq(
      (1L, "alpha beta gamma delta epsilon", 5L, 0L, 0L),
      (2L, "one two three four five six", 6L, 0L, 0L)))
  }

  test("shared span removed from BOTH documents; seam tokens survive") {
    // docs share the 6-token run "c1 c2 c3 c4 c5 c6" → every 4-token
    // window inside it is duplicated; unique prefixes/suffixes stay
    val out = run(Seq(
      (1L, "u1 u2 c1 c2 c3 c4 c5 c6 v1 v2"),
      (2L, "w1 w2 w3 c1 c2 c3 c4 c5 c6 x1")))
    assert(out(0) === ((1L, "u1 u2 v1 v2", 10L, 6L, 1L)))
    assert(out(1) === ((2L, "w1 w2 w3 x1", 10L, 6L, 1L)))
  }

  test("short duplicated doc (under K tokens, whole-doc window) empties entirely") {
    val out = run(Seq(
      (1L, "tiny dup"),
      (2L, "tiny dup"),
      (3L, "another unique doc here")))
    assert(out(0) === ((1L, "", 2L, 2L, 1L)))
    assert(out(1) === ((2L, "", 2L, 2L, 1L)))
    assert(out(2) === ((3L, "another unique doc here", 4L, 0L, 0L)))
  }

  test("two disjoint duplicated spans in one doc count as two maximal spans") {
    val out = run(Seq(
      (1L, "a1 a2 a3 a4 m1 m2 m3 m4 m5 b1 b2 b3 b4"),
      (2L, "a1 a2 a3 a4 zz1 zz2 zz3 zz4 zz5 zz6 zz7"),
      (3L, "y1 y2 y3 y4 y5 y6 y7 b1 b2 b3 b4")))
    val d1 = out(0)
    assert(d1._2 === "m1 m2 m3 m4 m5", s"unexpected cleaned text: $d1")
    assert(d1._4 === 8L && d1._5 === 2L, s"expected 8 removed in 2 spans: $d1")
  }

  test("construction property: no duplicated window survives intact (driver replay)") {
    // deterministic corpus with planted cross-doc duplication
    val rows = (0L until 40L).map { i =>
      val base = (0 until 12).map(j => s"t${(i * 7 + j * 3) % 23}")
      val planted =
        if (i % 3 == 0) Seq("dupA", "dupB", "dupC", "dupD", "dupE")
        else if (i % 5 == 0) Seq("repX", "repY", "repZ", "repW")
        else Nil
      (i, (base.take(6) ++ planted ++ base.drop(6)).mkString(" "))
    }
    val out = run(rows).map(r => r._1 -> r).toMap

    // driver replay of the operator's own granularity
    val toks = rows.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    def windowsOf(ts: Seq[String]): Seq[(Int, String)] =
      if (ts.size < K) Seq(0 -> ts.mkString(" "))
      else (0 to ts.size - K).map(p => p -> ts.slice(p, p + K).mkString(" "))
    val dfCount = toks.values.toSeq
      .flatMap(ts => windowsOf(ts).map(_._2).distinct)
      .groupBy(identity).map { case (w, o) => w -> o.size }
    for ((id, ts) <- toks) {
      val dupPos = windowsOf(ts).collect {
        case (p, w) if dfCount(w) >= 2 => p }
      val removed = dupPos.flatMap(p => p until math.min(p + K, ts.size)).toSet
      // every duplicated window lost at least one covered token
      for (p <- dupPos)
        assert((p until math.min(p + K, ts.size)).exists(removed.contains),
          s"doc $id: duplicated window at $p fully survived")
      // and the operator's outputs equal the replay exactly
      val kept = ts.indices.filterNot(removed.contains).map(ts)
      val spans = removed.toSeq.sorted
        .count(j => !removed.contains(j - 1))
      assert(out(id) === ((id, kept.mkString(" "), ts.size.toLong,
        removed.size.toLong, spans.toLong)), s"doc $id mismatch")
    }
    // sanity: the corpus actually exercised removal
    assert(out.values.exists(_._4 > 0), "no duplication planted?")
  }

  test("overlapping duplicated windows merge into one span (kernel sweep)") {
    import graft.functions.SpanExpressions
    val df = Seq((Seq("a", "b", "c", "d", "e", "f"), Seq(0, 1, 2)))
      .toDF("toks", "pos")
      .select(SpanExpressions.removeDupSpans($"toks", $"pos", 3).as("r"))
      .select("r.clean_text", "r.n_tokens", "r.n_removed", "r.n_spans")
      .as[(String, Long, Long, Long)].collect().head
    assert(df === (("f", 6L, 5L, 1L)))
  }

  test("incremental ≡ from-scratch: delta cleaned via the stored index equals the batch slice") {
    // history/delta with duplication WITHIN history-delta, WITHIN
    // delta-delta, and history-internal (must NOT affect delta)
    val rows = (0L until 30L).map { i =>
      val base = (0 until 10).map(j => s"h${(i * 5 + j * 3) % 19}")
      val planted =
        if (i % 4 == 0) Seq("sA", "sB", "sC", "sD", "sE") // crosses the split
        else if (i >= 20 && i % 2 == 1) Seq("dA", "dB", "dC", "dD") // delta-only dup
        else Nil
      (i, (base.take(5) ++ planted ++ base.drop(5)).mkString(" "))
    }
    val df = rows.toDF("doc_id", "text")
    val history = df.filter($"doc_id" < 20)
    val delta = df.filter($"doc_id" >= 20)
    val idx = ExactSubstr.windowDfTable(history, "doc_id", "text", windowTokens = K)
    val inc = ExactSubstr.removeDuplicatedSpansIncremental(
        idx, delta, "doc_id", "text", windowTokens = K)
      .orderBy("doc_id").as[(Long, String, Long, Long, Long)].collect()
    val batch = ExactSubstr.removeDuplicatedSpans(df, "doc_id", "text", windowTokens = K)
      .filter($"doc_id" >= 20)
      .orderBy("doc_id").as[(Long, String, Long, Long, Long)].collect()
    assert(inc.toSeq === batch.toSeq)
    // the planted cross-split span was actually removed from a delta doc
    assert(inc.exists(_._4 > 0), "no cross-split duplication exercised?")
    graft.core.OpCache.release(blocking = true)
  }

  test("out-of-range positions are ignored; span clips at doc end") {
    import graft.functions.SpanExpressions
    val df = Seq((Seq("a", "b", "c"), Seq(-1, 2, 99)))
      .toDF("toks", "pos")
      .select(SpanExpressions.removeDupSpans($"toks", $"pos", 3).as("r"))
      .select("r.clean_text", "r.n_tokens", "r.n_removed", "r.n_spans")
      .as[(String, Long, Long, Long)].collect().head
    // only pos=2 is in range; its span is [2, 3) after clipping
    assert(df === (("a b", 3L, 1L, 1L)))
  }
}
