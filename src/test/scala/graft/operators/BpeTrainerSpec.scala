package graft.operators

import graft.SparkSpec
import graft.core.OpCache
import scala.util.Random

/** BPE training: the distributed trainer must agree exactly with a
  * driver-side replay of Sennrich's algorithm (overlapping pair
  * stats, greedy non-overlapping merge, count-then-lex tie-break) on
  * arbitrary corpora — that exactness is what lets q99 gate the full
  * merge table against the DuckDB unroll.
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  /** Reference replay: the classic in-memory learn_bpe. */
  private def reference(texts: Seq[String], numMerges: Int): Seq[(Int, String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, f) => w.map(_.toString).toVector -> f }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var stop = false
    while (rank <= numMerges && !stop) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.size - 1)
        stats((syms(i), syms(i + 1))) = stats.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (stats.isEmpty) stop = true
      else {
        val ((l, r), c) = stats.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((rank, l, r, c))
        words = words.toSeq.map { case (syms, f) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.result() -> f
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        rank += 1
      }
    }
    out.toSeq
  }

  private def run(texts: Seq[String], numMerges: Int, every: Int = 4): Seq[(Int, String, String, Long)] =
    BpeTrainer.train(texts.toDF("text"), "text", numMerges, checkpointEvery = every)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("hand corpus: merges follow frequency with lexicographic ties") {
    // "low low low lower" — 'lo' (count 4) wins round 1, then 'low'
    val got = run(Seq("low low low lower"), 2)
    assert(got.head == ((1, "l", "o", 4L)))
    assert(got(1) == ((2, "lo", "w", 4L)))
  }

  test("greedy non-overlap: aaa counts 2 but merges once per word") {
    val got = run(Seq("aaa aaa"), 2)
    // round 1: (a,a) count 4 (overlapping, 2 per word)
    assert(got.head == ((1, "a", "a", 4L)))
    // each word is now [aa, a]: round 2 merges (aa, a) count 2
    assert(got(1) == ((2, "aa", "a", 2L)))
  }

  test("early stop: single-char vocabulary exhausts") {
    val got = run(Seq("a b c a"), 5)
    assert(got.isEmpty, s"no adjacent pairs exist, got $got")
  }

  test("property: trainer ≡ reference replay on random corpora, any checkpoint cadence") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val alphabet = "abcd"
      val texts = Seq.fill(30)(
        Seq.fill(3 + rnd.nextInt(5))(
          Seq.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(4))).mkString
        ).mkString(" "))
      val exp = reference(texts, 8)
      val got = run(texts, 8, every = 1 + trial)
      assert(got == exp, s"trial $trial diverged:\n got $got\n exp $exp")
    }
  }

  private def runHybrid(texts: Seq[String], numMerges: Int,
      distRounds: Int): Seq[(Int, String, String, Long)] =
    BpeTrainer.trainHybrid(texts.toDF("text"), "text", numMerges,
        distributedRounds = distRounds, checkpointEvery = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("property: hybrid ≡ all-distributed at every split point") {
    val rnd = new Random(19)
    for (trial <- 1 to 3) {
      val alphabet = "abcd"
      val texts = Seq.fill(25)(
        Seq.fill(3 + rnd.nextInt(5))(
          Seq.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(4))).mkString
        ).mkString(" "))
      val exp = run(texts, 10)
      for (split <- Seq(0, 1, 4, 10)) {
        val got = runHybrid(texts, 10, split)
        assert(got == exp,
          s"trial $trial split $split diverged:\n got $got\n exp $exp")
      }
    }
  }

  test("hybrid: local rounds keep UTF-8 byte tie-break on non-ASCII") {
    // U+E000 (3-byte UTF-8: EE 80 80) sorts BEFORE U+1F600 (F0 9F 98
    // 80) in UTF-8 bytes but AFTER its surrogate-led UTF-16 form —
    // a Java-String-ordered local argmax would flip this tie
    val texts = Seq("x x y😀 y😀")
    val exp = run(texts, 3)
    val got = runHybrid(texts, 3, 0)
    assert(got == exp, s"non-ASCII tie diverged:\n got $got\n exp $exp")
  }

  test("hybrid: early exhaustion inside the local phase stops cleanly") {
    // only one mergeable pair exists; asking for 5 merges must stop
    val got = runHybrid(Seq("ab ab c c"), 5, 0)
    assert(got == Seq((1, "a", "b", 2L)))
  }

  test("applyMerges segments with the learned model") {
    val merges = run(Seq("low low low lower"), 3).map(m => (m._2, m._3))
    val seg = Seq("lowest").toDF("w")
      .select(BpeTrainer.applyMerges($"w", merges).as("s"))
      .head().getSeq[String](0)
    assert(seg.head == "low", s"expected 'low' prefix token, got $seg")
  }

  test("checkpoint lifecycle: training state fully freed after train()") {
    OpCache.release(blocking = true)
    val base = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val m = run(Seq("deep deep learning learning learning"), 6, every = 2)
    assert(m.nonEmpty)
    val alive = spark.sparkContext.getPersistentRDDs.keySet.toSet -- base
    assert(alive.isEmpty,
      s"BPE training state must not outlive train(), saw $alive")
  }

  test("native BpeSegment kernel ≡ applyMerges fold on random words and merge lists") {
    import org.apache.spark.sql.functions.col
    val rnd = new Random(31)
    for (trial <- 1 to 5) {
      val alphabet = "abc"
      val words = Seq.fill(60)(
        Seq.fill(1 + rnd.nextInt(10))(alphabet(rnd.nextInt(3))).mkString)
      // random (possibly cascading) merge list, in "rank order"
      val merges = Seq.fill(6)((
        Seq.fill(1 + rnd.nextInt(2))(alphabet(rnd.nextInt(3))).mkString,
        Seq.fill(1 + rnd.nextInt(2))(alphabet(rnd.nextInt(3))).mkString))
      val df = words.toDF("w")
      val both = df.select(
          BpeTrainer.applyMerges(col("w"), merges).as("fold"),
          graft.functions.BpeExpressions.bpeSegment(col("w"), merges).as("kernel"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"trial $trial: kernel diverges from fold on merges $merges")
      }
    }
  }
}
