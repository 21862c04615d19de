package graft.functions

import graft.SparkSpec

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one[T: org.apache.spark.sql.Encoder](text: String, c: org.apache.spark.sql.Column): T =
    Seq(text).toDF("t").select(c.as("r")).as[T].head()

  test("tokens drop empties; tokenCount counts whitespace tokens") {
    assert(one[Int]("a b  c", Text.tokenCount($"t")) === 3)
    assert(one[Int]("", Text.tokenCount($"t")) === 0)
  }

  test("bpeish token count: 1 per ≤4 chars of a word + symbols") {
    // "hello" → 2 (5 chars / 4 rounded up), "," → 1, "hi" → 1
    assert(one[Long]("hello , hi", Text.bpeishTokenCount($"t")) === 4L)
  }

  test("stopword ratio") {
    // stopwords hit: "the", "on", "a" → 3 of 6
    assert(one[Double]("the cat sat on a mat", Text.stopwordRatio($"t")) === 3.0 / 6)
  }

  test("langId picks the language with most marker hits; und when none") {
    assert(one[String]("the cat and the dog is here", Text.langId($"t")) === "en")
    assert(one[String]("der hund und die katze ist da", Text.langId($"t")) === "de")
    assert(one[String]("le chat et la mer est grande", Text.langId($"t")) === "fr")
    assert(one[String]("el perro y los gatos es grande", Text.langId($"t")) === "es")
    assert(one[String]("xyz abc qrs", Text.langId($"t")) === "und")
  }

  test("quality score is clamped to [0,1] and rewards clean prose") {
    val good = one[Double]("the quick brown fox jumps over the lazy dog and runs to the hills again", Text.qualityScore($"t"))
    val bad = one[Double]("!!! ??? ... ,,, ;;; :::", Text.qualityScore($"t"))
    assert(good > bad)
    assert(good >= 0.0 && good <= 1.0 && bad >= 0.0 && bad <= 1.0)
  }

  test("fingerprint: deterministic, position-sensitive, bounded") {
    val a = one[Long]("hello world", Text.fingerprint($"t"))
    val b = one[Long]("world hello", Text.fingerprint($"t"))
    val a2 = one[Long]("hello world", Text.fingerprint($"t"))
    assert(a === a2)
    assert(a !== b) // position-weighted: anagram permutations differ
    assert(a >= 0 && a < 2147483647L)
  }
}
