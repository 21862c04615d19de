package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Gopher Table A1 format rules: each metric on hand-computable docs,
  * each threshold's planted violation, and the conjunction verdict.
  */
class GopherQualitySpec extends SparkSpec {
  import spark.implicits._

  private def row(text: String): Row =
    GopherQuality.report(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").collect().head

  private def metric(text: String, name: String): Any =
    row(text).getAs[Any](name)

  // 56 words, stop words present, all alpha, no symbols — passes all
  private val clean = (Seq.fill(7)(
    "the data of training and that model have") :+ "").mkString(" ").trim

  test("clean long doc passes every rule") {
    val r = row(clean)
    assert(r.getAs[Long]("n_words") === 56L)
    assert(r.getAs[Boolean]("pass"))
  }

  test("word count and mean word length") {
    assert(metric("the of", "n_words") === 2L)
    assert(row("the of").getAs[Boolean]("pass") === false)
    // "ab cd" → 4 chars / 2 words
    assert(metric("ab cd", "mean_word_len") === 2.0)
  }

  test("hash and ellipsis word ratios") {
    // 2 '#' chars over 4 words
    assert(metric("a# b c# d", "hash_word_ratio") === 0.5)
    // one "..." + one "…" over 2 words
    assert(metric("a... …b", "ellipsis_word_ratio") === 1.0)
    // greedy non-overlapping: 5 dots = ONE "..." plus ".." remainder
    assert(metric("w.....", "ellipsis_word_ratio") === 1.0)
    val spam = clean + " x... y... z... w... v... u... t..."
    assert(metric(spam, "ellipsis_word_ratio") ===
      math.rint(7.0 / 63.0 * 1e6) / 1e6)
    assert(row(spam).getAs[Boolean]("pass") === false)
  }

  test("bullet and ellipsis line fractions") {
    val t = "• one\n- two\n* three\nplain four"
    assert(metric(t, "bullet_line_frac") === 0.75)
    val e = "ends...\nalso…  \nnope"
    // rtrim before the suffix test: trailing spaces don't hide "…"
    assert(metric(e, "ellipsis_line_frac") ===
      math.rint(2.0 / 3.0 * 1e6) / 1e6)
  }

  test("alpha-word fraction and distinct stop-word hits") {
    assert(metric("abc 123 a1", "alpha_word_frac") ===
      math.rint(2.0 / 3.0 * 1e6) / 1e6)
    // case-folded, DISTINCT: {the, that} = 2 despite three tokens
    assert(metric("The THAT the", "stop_hits") === 2L)
    assert(metric("data model pipeline", "stop_hits") === 0L)
  }

  test("empty and no-newline docs are well-defined") {
    val r = row("")
    assert(r.getAs[Long]("n_words") === 0L)
    assert(r.getAs[Double]("mean_word_len") === 0.0)
    assert(r.getAs[Boolean]("pass") === false)
  }

  test("NULL text yields all-zero metrics and pass=false, never nulls") {
    val r = GopherQuality.report(
        Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
        "doc_id", "text").collect().head
    assert(!r.anyNull, r.toString)
    assert(r.getAs[Long]("n_words") === 0L)
    assert(r.getAs[Double]("bullet_line_frac") === 0.0)
    assert(r.getAs[Double]("ellipsis_line_frac") === 0.0)
    assert(r.getAs[Long]("stop_hits") === 0L)
    assert(r.getAs[Boolean]("pass") === false)
  }

  test("thresholds are tunable parameters") {
    // the clean doc fails under a stricter corpus-specific word floor,
    // and the 2-word doc passes once every bound is relaxed
    val strict = GopherQuality.report(
        Seq((1L, clean)).toDF("doc_id", "text"), "doc_id", "text",
        minWords = 100L).collect().head
    assert(strict.getAs[Boolean]("pass") === false)
    val lax = GopherQuality.report(
        Seq((1L, "the of")).toDF("doc_id", "text"), "doc_id", "text",
        minWords = 1L, minMeanWordLen = 0.0, minStopWords = 1L)
      .collect().head
    assert(lax.getAs[Boolean]("pass") === true)
  }
}
