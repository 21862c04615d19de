package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def seg(vocab: Seq[String], words: String*): Map[String, Seq[String]] =
    words.toDF("w")
      .select(col("w"), WordPieceExpressions.wordPiece(col("w"),
        new WordPieceVocab(vocab.toArray)).as("p"))
      .as[(String, Seq[String])].collect().toMap

  test("greedy longest-match-first; UNK falls back to the single char") {
    val v = Seq("a", "b", "ab", "abc", "bc")
    val got = seg(v, "abcbc", "abab", "axb")
    // pos 0: abc (longest), pos 3: bc
    assert(got("abcbc") === Seq("abc", "bc"))
    // ab then ab — greedy never reconsiders
    assert(got("abab") === Seq("ab", "ab"))
    // x is OOV → emitted as itself
    assert(got("axb") === Seq("a", "x", "b"))
  }

  test("greedy is NOT globally optimal — locks the WordPiece (not Viterbi) contract") {
    // vocab can segment "abcd" as [ab, cd] (2 pieces) but greedy takes
    // abc first and pays [abc, c?]-style fallback — the documented
    // longest-match-FIRST semantics, distinct from unigram-LM Viterbi
    val got = seg(Seq("ab", "cd", "abc"), "abcd")
    assert(got("abcd") === Seq("abc", "d"))
  }

  test("driver replay property on random corpora, any partitioning") {
    val rnd = new scala.util.Random(31)
    val alphabet = "abcde"
    def randWord(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(5))).mkString
    val vocab = (('a' to 'e').map(_.toString) ++
      Seq.fill(30)(randWord(2 + rnd.nextInt(3)))).distinct
    val vs = vocab.toSet
    val maxLen = vocab.map(_.length).max
    def replay(w: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        val l = (math.min(maxLen, w.length - pos) to 1 by -1)
          .find(l => vs(w.substring(pos, pos + l))).getOrElse(1)
        out += w.substring(pos, pos + l)
        pos += l
      }
      out.toSeq
    }
    val words = Seq.fill(300)(randWord(1 + rnd.nextInt(12))).distinct
    for (parts <- Seq(1, 7)) {
      val got = words.toDF("w").repartition(parts)
        .select(col("w"), WordPieceExpressions.wordPiece(col("w"),
          new WordPieceVocab(vocab.toArray)).as("p"))
        .as[(String, Seq[String])].collect().toMap
      words.foreach(w => assert(got(w) === replay(w), s"word $w parts $parts"))
    }
  }

  test("segmentation concatenates back to the word (lossless cover)") {
    val v = Seq("q", "w", "qw", "wq")
    val words = Seq("qwwq", "wqqw", "qqqq")
    val got = seg(v, words: _*)
    words.foreach(w => assert(got(w).mkString === w))
  }
}
