package graft.operators

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  /** Driver replay of the exact pipeline (counts, Laplace, 9-dp log
    * rounding, exact mean, exp) for arbitrary corpora.
    */
  private def replay(train: Seq[String], score: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    def toks(s: String) = s.split(" ").filter(_.nonEmpty).toSeq
    def bgs(s: String) = toks(s).sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1))).toSeq
    val counts = train.flatMap(bgs).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctx = counts.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val v = train.flatMap(toks).distinct.size.toLong
    score.flatMap { case (id, text) =>
      val b = bgs(text)
      if (b.isEmpty) None
      else {
        val lls = b.map { p =>
          val c = counts.getOrElse(p, 0L)
          val cx = ctx.getOrElse(p._1, 0L)
          BigDecimal(math.log((c + 1).toDouble / (cx + v).toDouble))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
        val avg = lls.sum.toDouble / lls.size // decimal-exact sum, ONE fp divide
        val ppl = BigDecimal(math.exp(-avg))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some(id -> (b.size.toLong, ppl))
      }
    }.toMap
  }

  private def run(train: Seq[String], score: Seq[(Long, String)],
      parts: Int): Map[Long, (Long, Double)] = {
    val (bg, vocab) = LanguageModel.trainBigram(
      train.toDF("text").repartition(parts), "text")
    LanguageModel.perplexity(
        score.toDF("doc_id", "text").repartition(parts), "doc_id", "text", bg, vocab)
      .select("doc_id", "n_bigrams", "ppl")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, p) => id -> (n, p) }.toMap
  }

  test("property: operator ≡ driver replay on random corpora, any partitioning") {
    val rnd = new Random(11)
    val vocabulary = Vector("the", "cat", "sat", "on", "mat", "dog", "ran", "far")
    for (trial <- 1 to 3) {
      val train = Seq.fill(40)(
        Seq.fill(2 + rnd.nextInt(10))(vocabulary(rnd.nextInt(8))).mkString(" "))
      val score = (0L until 25L).map(i =>
        (i, Seq.fill(rnd.nextInt(8))(vocabulary(rnd.nextInt(8))).mkString(" ")))
      val exp = replay(train, score)
      for (parts <- Seq(1, 7)) {
        val got = run(train, score, parts)
        assert(got === exp, s"trial $trial parts $parts diverged")
      }
      graft.core.OpCache.release()
    }
  }

  test("fluent text scores lower perplexity than shuffled text") {
    val train = Seq.fill(30)("the cat sat on the mat")
    val score = Seq((1L, "the cat sat on the mat"), (2L, "mat the on cat the sat"))
    val got = run(train, score, 2)
    assert(got(1L)._2 < got(2L)._2,
      s"in-domain text must score lower ppl: $got")
  }

  test("unseen context falls back to the uniform Laplace mass") {
    val train = Seq("a b a b")
    val score = Seq((1L, "zz qq"))          // both words OOV
    val got = run(train, score, 1)
    // p = (0+1)/(0+V) with V=2 → ppl = exp(ln 2) = 2
    assert(got(1L) === ((1L, 2.0)), s"got $got")
  }

  test("sub-2-token docs are absent (no LM evidence)") {
    val got = run(Seq("a b"), Seq((1L, "a"), (2L, ""), (3L, "a b")), 1)
    assert(got.keySet === Set(3L))
  }

  // ---- interpolated Kneser-Ney ----

  private def replayKn(train: Seq[String], score: Seq[(Long, String)],
      d: Double = 0.75): Map[Long, (Long, Double)] = {
    def toks(s: String) = s.split(" ").filter(_.nonEmpty).toSeq
    def bgs(s: String) = toks(s).sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1))).toSeq
    val counts = train.flatMap(bgs).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctx = counts.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val n1f = counts.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1b = counts.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nb = counts.size.toLong
    score.flatMap { case (id, text) =>
      val b = bgs(text)
      if (b.isEmpty) None
      else {
        val lls = b.map { case (w1, w2) =>
          val pc = n1b.get(w2) match {
            case Some(n) => n.toDouble / nb.toDouble
            case None    => 0.5 / nb.toDouble
          }
          val p = ctx.get(w1) match {
            case Some(cw) =>
              math.max(counts.getOrElse((w1, w2), 0L).toDouble - d, 0.0) / cw.toDouble +
                (d * n1f(w1).toDouble / cw.toDouble) * pc
            case None => pc
          }
          BigDecimal(math.log(p)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
        val avg = lls.sum.toDouble / lls.size
        val ppl = BigDecimal(math.exp(-avg))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some(id -> (b.size.toLong, ppl))
      }
    }.toMap
  }

  private def runKn(train: Seq[String], score: Seq[(Long, String)],
      parts: Int): Map[Long, (Long, Double)] = {
    val (bg, _) = LanguageModel.trainBigram(
      train.toDF("text").repartition(parts), "text")
    LanguageModel.perplexityKneserNey(
        score.toDF("doc_id", "text").repartition(parts), "doc_id", "text", bg)
      .select("doc_id", "n_bigrams", "ppl")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, p) => id -> (n, p) }.toMap
  }

  test("KN property: operator ≡ driver replay on random corpora, any partitioning") {
    val rnd = new Random(23)
    val vocabulary = Vector("the", "cat", "sat", "on", "mat", "dog", "ran", "far")
    for (trial <- 1 to 3) {
      val train = Seq.fill(40)(
        Seq.fill(2 + rnd.nextInt(10))(vocabulary(rnd.nextInt(8))).mkString(" "))
      val score = (0L until 25L).map(i =>
        (i, Seq.fill(rnd.nextInt(8))(vocabulary(rnd.nextInt(8))).mkString(" ")))
      val exp = replayKn(train, score)
      for (parts <- Seq(1, 7)) {
        val got = runKn(train, score, parts)
        assert(got === exp, s"trial $trial parts $parts diverged")
      }
      graft.core.OpCache.release()
    }
  }

  test("KN conditionals sum to 1 over the continuation-covered vocabulary") {
    // for each seen context w1: Σ_{w2 ∈ V} p(w2|w1) = 1 when P_cont
    // sums to 1 over V (i.e. every vocab token has n1b > 0) — the
    // normalization Chen & Goodman prove for interpolated KN
    val train = Seq("a b a c b c a b c b a a c")
    def toks(s: String) = s.split(" ").toSeq
    val counts = train.flatMap(s => toks(s).sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctx = counts.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val n1f = counts.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1b = counts.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nb = counts.size.toLong
    val vocab = Seq("a", "b", "c")
    for (w1 <- vocab) {
      val total = vocab.map { w2 =>
        math.max(counts.getOrElse((w1, w2), 0L).toDouble - 0.75, 0.0) / ctx(w1).toDouble +
          (0.75 * n1f(w1).toDouble / ctx(w1).toDouble) * (n1b(w2).toDouble / nb.toDouble)
      }.sum
      assert(math.abs(total - 1.0) < 1e-12, s"p(.|$w1) sums to $total")
    }
  }

  test("KN: frequent-but-context-bound continuation scores below Laplace's estimate") {
    // "francisco" appears often but ONLY after "san"; "the" follows
    // many contexts. Under an unseen context, KN ranks "the" far
    // above "francisco" — Laplace ranks them by raw frequency.
    val train = Seq.fill(10)("san francisco is near the bay and the bridge").mkString(" ")
    val score = Seq((1L, "zz francisco"), (2L, "zz the"))
    val got = runKn(Seq(train), score, 1)
    assert(got(2L)._2 < got(1L)._2,
      s"KN must prefer the high-continuation token under an unseen context: $got")
  }

  // ---- interpolated trigram ----

  /** Driver replay of the trigram λ-mix pipeline. */
  private def replay3(train: Seq[String], score: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    def toks(s: String) = s.split(" ").filter(_.nonEmpty).toSeq
    def tgs(s: String) = toks(s).sliding(3).filter(_.size == 3)
      .map(p => (p(0), p(1), p(2))).toSeq
    def bgs(s: String) = toks(s).sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1))).toSeq
    val c3 = train.flatMap(tgs).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = train.flatMap(bgs).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = train.flatMap(toks).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val x3 = c3.toSeq.groupBy(e => (e._1._1, e._1._2)).view.mapValues(_.map(_._2).sum).toMap
    val x2 = c2.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val t = train.map(toks(_).size.toLong).sum
    val v = train.flatMap(toks).distinct.size.toLong
    score.flatMap { case (id, text) =>
      val g = tgs(text)
      if (g.isEmpty) None
      else {
        val lls = g.map { case (w1, w2, w3) =>
          val p3 = x3.get((w1, w2)).map(x => c3.getOrElse((w1, w2, w3), 0L).toDouble / x).getOrElse(0.0)
          val p2 = x2.get(w2).map(x => c2.getOrElse((w2, w3), 0L).toDouble / x).getOrElse(0.0)
          val p1 = (c1.getOrElse(w3, 0L) + 1).toDouble / (t + v).toDouble
          BigDecimal(math.log(0.6 * p3 + 0.3 * p2 + 0.1 * p1))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
        val avg = lls.sum.toDouble / lls.size
        val ppl = BigDecimal(math.exp(-avg))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some(id -> (g.size.toLong, ppl))
      }
    }.toMap
  }

  private def run3(train: Seq[String], score: Seq[(Long, String)],
      parts: Int): Map[Long, (Long, Double)] = {
    val (tri, bi, uni, tot) = LanguageModel.trainTrigram(
      train.toDF("text").repartition(parts), "text")
    LanguageModel.perplexityTrigram(
        score.toDF("doc_id", "text").repartition(parts), "doc_id", "text",
        tri, bi, uni, tot)
      .select("doc_id", "n_trigrams", "ppl")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, p) => id -> (n, p) }.toMap
  }

  test("trigram property: operator ≡ driver replay on random corpora, any partitioning") {
    val rnd = new Random(23)
    val vocabulary = Vector("the", "cat", "sat", "on", "mat", "dog", "ran", "far")
    for (trial <- 1 to 3) {
      val train = Seq.fill(40)(
        Seq.fill(3 + rnd.nextInt(10))(vocabulary(rnd.nextInt(8))).mkString(" "))
      val score = (0L until 25L).map(i =>
        (i, Seq.fill(rnd.nextInt(9))(vocabulary(rnd.nextInt(8))).mkString(" ")))
      val exp = replay3(train, score)
      for (parts <- Seq(1, 7)) {
        val got = run3(train, score, parts)
        assert(got === exp, s"trial $trial parts $parts diverged")
      }
      graft.core.OpCache.release()
    }
  }

  test("trigram beats bigram on in-domain text (higher orders carry more evidence)") {
    val train = Seq.fill(30)("the cat sat on the mat while the dog ran far")
    val doc = Seq((1L, "the cat sat on the mat"))
    val tri = run3(train, doc, 2)(1L)._2
    val bg = run(train, doc, 2)(1L)._2
    assert(tri < bg, s"trigram ppl $tri should beat bigram ppl $bg in-domain")
  }

  test("sub-3-token docs are absent from the trigram scorer") {
    val got = run3(Seq("a b c"), Seq((1L, "a b"), (2L, ""), (3L, "a b c")), 1)
    assert(got.keySet === Set(3L))
  }
}
