package graft.operators

import graft.SparkSpec
import graft.functions.{UnigramExpressions, UnigramKernel, UnigramLmModel, WordPieceKernel, WordPieceVocab}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer: Viterbi kernel properties (global optimality
  * vs an exhaustive driver replay, tie rule, divergence from
  * WordPiece's greedy walk — the q123 spec's "NOT-Viterbi" lock made
  * real from the other side) and trainer round semantics.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def model(entries: (String, Long)*): UnigramLmModel =
    new UnigramLmModel(entries.map(_._1).toArray, entries.map(_._2).toArray)

  private def seg(w: String, m: UnigramLmModel): Seq[String] = {
    val a = UnigramKernel.viterbi(UTF8String.fromString(w), m)
    (0 until a.numElements()).map(a.getUTF8String(_).toString)
  }

  private def cost(pieces: Seq[String], m: UnigramLmModel): Long =
    pieces.map(p => Option(m.map.get(p)).map(_.longValue())
      .getOrElse(UnigramLmModel.Big)).sum

  /** All segmentations of `w` into pieces of length 1..maxL. */
  private def allSegs(w: String, maxL: Int): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(maxL, w.length)).flatMap(l =>
      allSegs(w.drop(l), maxL).map(w.take(l) +: _))

  test("viterbi picks the globally cheapest segmentation (hand-checked DP)") {
    val m = model("a" -> 10L, "b" -> 10L, "c" -> 10L,
      "ab" -> 15L, "abc" -> 22L, "abca" -> 28L, "cab" -> 22L)
    assert(seg("abcab", m) === Seq("ab", "cab")) // cost 37; greedy abca|b = 38
  }

  test("minimality property: viterbi cost == exhaustive minimum (driver replay)") {
    // deterministic pseudo-random model over a 3-char alphabet
    val varied = Seq("a", "b", "c", "ab", "ba", "cb", "abc", "bca", "cab",
      "abca", "bcab", "aa", "bb", "cc", "aab", "abb")
    val m = model(varied.zipWithIndex.map { case (p, i) =>
      p -> (7L + ((i * 13) % 29).toLong) * 1000000000L }: _*)
    val words = Seq("abcab", "aabbcc", "cabcabcab", "abcabcab", "bbbb",
      "acbacb", "aaaa", "cccaaa", "ab", "a", "abcabcabcabc")
    for (w <- words) {
      val got = seg(w, m)
      assert(got.mkString("") === w, s"$w: pieces don't re-concatenate")
      val best = allSegs(w, 4).map(s => cost(s, m)).min
      assert(cost(got, m) === best,
        s"$w: viterbi cost ${cost(got, m)} != exhaustive min $best (got $got)")
    }
  }

  test("tie rule: longest piece wins an exact cost tie") {
    // nlp(ab) == nlp(a) + nlp(b): both segmentations cost 20
    val m = model("a" -> 10L, "b" -> 10L, "ab" -> 20L)
    assert(seg("ab", m) === Seq("ab"))
  }

  test("viterbi diverges from WordPiece greedy where greedy is suboptimal") {
    // greedy longest-match takes "ab" then is stuck with expensive "c";
    // viterbi prefers a|bc
    val m = model("a" -> 10L, "b" -> 10L, "c" -> 50L, "ab" -> 15L, "bc" -> 12L)
    assert(seg("abc", m) === Seq("a", "bc")) // 22 < ab|c = 65
    val wp = new WordPieceVocab(Array("a", "b", "c", "ab", "bc"))
    val g = WordPieceKernel.segment(UTF8String.fromString("abc"), wp)
    val greedy = (0 until g.numElements()).map(g.getUTF8String(_).toString)
    assert(greedy === Seq("ab", "c"), "greedy baseline changed")
  }

  test("unseen chars ride Big-cost single-char pieces (progress guaranteed)") {
    val m = model("a" -> 10L, "b" -> 10L)
    assert(seg("axb", m) === Seq("a", "x", "b"))
    assert(seg("", m) === Seq.empty)
  }

  test("pruning: chars always survive, exactly pruneToMulti multi pieces remain, coverage holds") {
    val docs = Seq.fill(20)("the stream the dream the theme streaming dreaming").toDF("text")
    val words = UnigramTrainer.distinctWords(docs, "text")
    val out = UnigramTrainer.trainPruned(words, maxPieceLen = 4, topKMulti = 50,
      emRounds = 1, pruneToMulti = 3)
      .as[(String, Long, Long)].collect()
    val chars = words.as[(String, Long)].collect().flatMap(_._1.toSeq).map(_.toString).distinct
    val (single, multi) = out.map(_._1).partition(_.length == 1)
    assert(single.toSet === chars.toSet, "pruning dropped a character piece")
    assert(multi.length === 3, s"expected exactly 3 multi pieces, got ${multi.toSeq}")
    // coverage: every corpus word still segments losslessly under the pruned model
    val model = new graft.functions.UnigramLmModel(
      out.map(_._1), out.map(_._3))
    for ((w, _) <- words.as[(String, Long)].collect())
      assert(seg(w, model).mkString("") === w, s"pruned model cannot cover '$w'")
    graft.core.OpCache.release(blocking = true)
  }

  test("trainer: seed inventory and one hard-EM round match a driver replay") {
    val docs = Seq(
      "the stream the stream", "stream the dream", "dream the theme")
      .toDF("text")
    val words = UnigramTrainer.distinctWords(docs, "text")
    val out = UnigramTrainer.train(words, maxPieceLen = 4, topKMulti = 10,
      emRounds = 1).orderBy("piece")
      .as[(String, Long, Long)].collect()

    // driver replay
    val wf = words.as[(String, Long)].collect().toMap
    def grams(n: Int) = wf.toSeq.flatMap { case (w, f) =>
      (0 to w.length - n).map(i => w.substring(i, i + n) -> f)
    }.groupBy(_._1).map { case (p, o) => p -> o.map(_._2).sum }
    val chars = grams(1)
    val multi = (2 to 4).flatMap(grams).sortBy { case (p, f) => (-f, p) }.take(10)
    val seed = (chars.toSeq ++ multi).toMap
    val tot = seed.values.sum
    val m0 = model(seed.toSeq.map { case (p, f) =>
      p -> math.round(-math.log(f.toDouble / tot.toDouble) * 1e9) }: _*)
    val counts = wf.toSeq.flatMap { case (w, f) => seg(w, m0).map(_ -> f) }
      .groupBy(_._1).map { case (p, o) => p -> o.map(_._2).sum }
    val c = seed.keys.map(p => p -> counts.getOrElse(p, 0L)).toMap
    val totC = c.values.map(_ + 1L).sum
    val expect = c.toSeq.sortBy(_._1).map { case (p, cr) =>
      (p, cr, math.round(-math.log((cr + 1).toDouble / totC.toDouble) * 1e9)) }
    assert(out.toSeq === expect)
    graft.core.OpCache.release(blocking = true)
  }
}
