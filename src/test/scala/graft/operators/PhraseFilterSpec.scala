package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.AhoCorasick

/** AhoCorasick.Automaton (multi-pattern substring scan) and
  * PhraseFilter.tagBanned.
  */
class PhraseFilterSpec extends SparkSpec {
  import spark.implicits._

  private def matches(phrases: Seq[String], text: String): Seq[String] = {
    val arr = new AhoCorasick.Automaton(phrases)
      .matchDistinct(UTF8String.fromString(text))
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }

  /** Naive reference: distinct sorted phrases with contains(text, p). */
  private def naive(phrases: Seq[String], text: String): Seq[String] =
    phrases.distinct.sorted.filter(text.contains)

  test("suffix-sharing patterns all fire (the classic he/she/hers case)") {
    val ps = Seq("he", "she", "his", "hers")
    assert(matches(ps, "ushers") === Seq("he", "hers", "she"))
    assert(matches(ps, "this") === Seq("his"))
    assert(matches(ps, "hi") === Seq())
  }

  test("overlapping and nested phrases are each reported once") {
    val ps = Seq("casino", "casino bonus", "cheap pills", "pills now")
    assert(matches(ps, "get cheap pills now at the casino bonus desk") ===
      Seq("casino", "casino bonus", "cheap pills", "pills now"))
    assert(matches(ps, "casino casino casino") === Seq("casino"))
  }

  test("matches at text start, end, and as the whole text") {
    val ps = Seq("abc", "xyz")
    assert(matches(ps, "abc then xyz") === Seq("abc", "xyz"))
    assert(matches(ps, "abc") === Seq("abc"))
  }

  test("substring semantics: ass matches classification (documented)") {
    assert(matches(Seq("ass"), "classification") === Seq("ass"))
  }

  test("multibyte text walks safely") {
    val ps = Seq("naïve", "日本")
    assert(matches(ps, "a naïve 日本語 sentence") === Seq("naïve", "日本"))
    assert(matches(ps, "plain ascii") === Seq())
  }

  test("property: automaton equals the naive contains scan") {
    val alphabet = "abc"
    // deterministic pseudo-random strings over a 3-char alphabet so
    // overlaps and fail-link paths are actually exercised
    def str(seed: Int, len: Int): String =
      (0 until len).map(i =>
        alphabet(((seed * 31 + i) * 2654435761L % 3).toInt.abs)).mkString
    val phrases = Seq("a", "ab", "ba", "aab", "abab", "bbb", "cab", "abc")
    for (seed <- 1 to 200) {
      val t = str(seed, 1 + seed % 40)
      assert(matches(phrases, t) === naive(phrases, t), s"text=$t")
    }
  }

  test("tagBanned folds case and joins sorted matches") {
    val df = Seq(
      (1L, "Visit the CASINO Bonus page"),
      (2L, "nothing to see"),
      (3L, "cheap PILLS now")).toDF("doc_id", "text")
    val r = PhraseFilter.tagBanned(df, "text",
        Seq("Casino Bonus", "casino", "cheap pills", "pills now"))
      .orderBy("doc_id")
      .select("n_banned", "banned", "phrases").collect()
    assert(r(0).getInt(0) === 2 && r(0).getBoolean(1)
      && r(0).getString(2) === "casino,casino bonus")
    assert(r(1).getInt(0) === 0 && !r(1).getBoolean(1) && r(1).isNullAt(2))
    assert(r(2).getString(2) === "cheap pills,pills now")
  }

  test("empty or blank phrase lists are rejected") {
    intercept[IllegalArgumentException] {
      new AhoCorasick.Automaton(Seq.empty)
    }
    intercept[IllegalArgumentException] {
      new AhoCorasick.Automaton(Seq("ok", ""))
    }
  }
}
