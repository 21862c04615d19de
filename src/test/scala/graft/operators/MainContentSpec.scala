package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** jusText-style main-content extraction: block split, densities,
  * initial classes, the neighbor context pass, and plan shape.
  */
class MainContentSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the data of training and that model have with pipeline" // 6/10 stops
  private val near =
    "the data of pipeline training quality corpus tokens metrics eval" // 2/10
  private val low =
    "data model pipeline training quality corpus tokens metrics eval systems" // 0/10

  private def extract(html: String): Row =
    MainContent.extract(Seq((1L, html)).toDF("doc_id", "html"),
      "doc_id", "html").collect().head

  private def blocks(html: String): Seq[Row] =
    MainContent.blockReport(Seq((1L, html)).toDF("doc_id", "html"),
      "doc_id", "html").orderBy("block_idx").collect().toSeq

  test("clean article: nav and footer links die, content survives") {
    val html = s"""<div><a href="#">home</a> <a href="#">about</a></div>""" +
      s"<p>$good</p>" +
      s"""<div><a href="#">terms</a> <a href="#">privacy</a></div>"""
    val r = extract(html)
    assert(r.getAs[Long]("n_blocks") === 3L)
    assert(r.getAs[Long]("n_kept") === 1L)
    assert(r.getAs[String]("content") === good)
    val b = blocks(html)
    assert(b.map(_.getAs[String]("cls")) === Seq("bad", "good", "bad"))
    assert(b(0).getAs[Double]("link_density") > 0.35)
    assert(b(1).getAs[Double]("link_density") === 0.0)
    assert(b(1).getAs[Double]("stop_frac") === 0.6)
  }

  test("context pass: short and near-good promoted only next to good") {
    // short between goods → promoted
    val promoted = extract(s"<p>$good</p><p>see item now</p><p>$good</p>")
    assert(promoted.getAs[Long]("n_kept") === 3L)
    // short between link blocks → demoted
    val demoted = extract(
      s"""<div><a href="#">home</a> <a href="#">more</a></div>""" +
        "<p>see item now</p>" +
        s"""<div><a href="#">terms</a> <a href="#">priv</a></div>""")
    assert(demoted.getAs[Long]("n_kept") === 0L)
    assert(demoted.getAs[String]("content") === "")
    // near-good next to good → promoted; isolated → demoted
    val ng = blocks(s"<p>$near</p><p>$good</p><p>$low</p>")
    assert(ng.map(_.getAs[String]("cls")) ===
      Seq("near_good", "good", "bad"))
    assert(ng.map(_.getAs[String]("final")) === Seq("good", "good", "bad"))
    val iso = blocks(s"<p>$low</p><p>$near</p><p>$low</p>")
    assert(iso.map(_.getAs[String]("final")) === Seq("bad", "bad", "bad"))
  }

  test("link density beats word count; nested-markup anchors don't count") {
    // a long link list: ≥8 words but all anchor text → bad
    val ll = blocks("""<ul><li><a href="#">one two three four five six""" +
      """ seven eight nine</a></li></ul>""")
    assert(ll.map(_.getAs[String]("cls")) === Seq("bad"))
    assert(ll.head.getAs[Double]("link_density") === 1.0)
    // nested markup inside the anchor → simple-anchor pattern skips it
    val nested = blocks(s"""<p><a href="#"><b>bold</b> link</a> $good</p>""")
    assert(nested.head.getAs[Double]("link_density") === 0.0)
  }

  test("empty blocks between adjacent tags are dropped before context") {
    // adjacent tags yield empty segments; the short block's TRUE
    // neighbor is the good paragraph, not an empty segment
    val r = extract(s"<div></div><p>$good</p><div></div><p>see it</p>")
    assert(r.getAs[Long]("n_blocks") === 2L)
    assert(r.getAs[Long]("n_kept") === 2L)
  }

  test("NULL and empty pages yield zero blocks and empty content, never nulls") {
    val out = MainContent.extract(
        Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "<div></div>"))
          .toDF("doc_id", "html"),
        "doc_id", "html")
      .orderBy("doc_id").collect()
    out.foreach { r =>
      assert(!r.anyNull, r.toString)
      assert(r.getAs[Long]("n_blocks") === 0L)
      assert(r.getAs[String]("content") === "")
    }
  }

  test("zero-exchange plan; whole operator is one per-row projection") {
    val docs = (1L to 20L).map(i =>
      (i, s"<p>$good $i</p><p>see $i</p>")).toDF("doc_id", "html")
    val plan = MainContent.extract(docs, "doc_id", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("deterministic at any partitioning; tunable thresholds") {
    val docs = (1L to 30L).map(i =>
      (i, s"<p>$good item$i</p><p>see item$i now</p><p>$near tail$i</p>"))
    def go(p: Int) = MainContent.extract(
        docs.toDF("doc_id", "html").repartition(p), "doc_id", "html")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(go(1) === go(7))
    // raising minWords past the good block's length demotes everything
    val strict = MainContent.extract(
      Seq((1L, s"<p>$good</p>")).toDF("doc_id", "html"),
      "doc_id", "html", minWords = 11).collect().head
    assert(strict.getAs[Long]("n_kept") === 0L)
  }
}
