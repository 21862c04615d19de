package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** C4 line filters: each line rule, each page rule in order, the
  * sentence-count convention, null pages, and plan shape.
  */
class C4FilterSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String): Row =
    C4Filter.clean(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").collect().head

  private val good = "the data of training and that model have with care."

  test("line retention: terminal punctuation, word floor, javascript") {
    val r = run(Seq(
      good,                                    // kept
      "short line.",                           // < 5 words
      "no terminal punctuation in this line",  // no . ! ?
      "does this survive the question mark?",  // kept
      "he said \"this thing really works.\"",  // terminal inside quote: kept
      "enable javascript to view this page.",  // js line
      good).mkString("\n"))
    assert(r.getAs[Long]("n_lines_kept") === 4L)
    assert(r.getAs[String]("kept_text").split("\n").length === 4)
  }

  test("page rules fire in order: sentences, lorem ipsum, curly brace") {
    // two surviving sentences → too_few_sentences wins even with {
    val few = run(s"$good\n$good\ncode { block }")
    assert(few.getAs[String]("drop_reason") === "too_few_sentences")
    assert(few.getAs[Boolean]("keep_doc") === false)
    // enough sentences, lorem beats curly brace
    val lorem = run(s"$good\n$good\n$good\nLorem Ipsum filler { here.")
    assert(lorem.getAs[String]("drop_reason") === "lorem_ipsum")
    val curly = run(s"$good\n$good\n$good\nsome { code")
    assert(curly.getAs[String]("drop_reason") === "curly_brace")
    val clean = run(s"$good\n$good\n$good")
    assert(clean.getAs[Boolean]("keep_doc") === true)
    assert(clean.getAs[String]("drop_reason") === "")
    assert(clean.getAs[Long]("n_sentences") === 3L)
  }

  test("sentence count is the terminal-mark count of the KEPT text") {
    // a dropped line's punctuation does not count
    val r = run(s"$good\nok! ok! ok!\n$good\n$good")
    assert(r.getAs[Long]("n_sentences") === 3L)
    // multiple marks inside one kept line all count (documented
    // simplification vs a sentence splitter)
    val multi = run(
      "it works! really? yes it does and that is the point.")
    assert(multi.getAs[Long]("n_sentences") === 3L)
  }

  test("NULL and empty pages: zero lines, keep_doc false, no nulls") {
    for (t <- Seq(null.asInstanceOf[String], "")) {
      val r = run(t)
      assert(!r.anyNull, r.toString)
      assert(r.getAs[Long]("n_lines_kept") === 0L)
      assert(r.getAs[String]("kept_text") === "")
      assert(r.getAs[Boolean]("keep_doc") === false)
      assert(r.getAs[String]("drop_reason") === "too_few_sentences")
    }
  }

  test("zero-exchange per-row plan; deterministic at any partitioning") {
    val docs = (1L to 40L).map(i => (i, s"$good\n$good\nline $i of it."))
      .toDF("doc_id", "text")
    val cleaned = C4Filter.clean(docs, "doc_id", "text")
    val plan = cleaned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    def go(p: Int) = C4Filter.clean(docs.repartition(p), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(go(1) === go(5))
  }
}
