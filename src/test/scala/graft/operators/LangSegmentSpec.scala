package graft.operators

import graft.SparkSpec

/** LangSegment.segments (per-line language spans). */
class LangSegmentSpec extends SparkSpec {
  import spark.implicits._

  private def spans(text: String): Seq[(Long, String, Long, String)] =
    LangSegment.segments(Seq((1L, text)).toDF("id", "text"), "id", "text")
      .orderBy("span_idx")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3),
        r.getString(4))).toSeq

  test("contiguous same-language lines merge into one span") {
    val s = spans("the and of\nthe is to\nder und die\nle la et")
    assert(s === Seq(
      (0L, "en", 2L, "the and of\nthe is to"),
      (1L, "de", 1L, "der und die"),
      (2L, "fr", 1L, "le la et")))
  }

  test("language alternation opens a new span each time") {
    val s = spans("the and of\nder und die\nthe is to")
    assert(s.map(x => (x._1, x._2)) ===
      Seq((0L, "en"), (1L, "de"), (2L, "en")))
  }

  test("marker-free lines are 'und' spans, merged when adjacent") {
    val s = spans("xyz qqq\nzzz www\nthe and of")
    assert(s === Seq(
      (0L, "und", 2L, "xyz qqq\nzzz www"),
      (1L, "en", 1L, "the and of")))
  }

  test("single-line doc is one span") {
    assert(spans("der und die ist") === Seq((0L, "de", 1L, "der und die ist")))
  }
}
