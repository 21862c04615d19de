package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Misra-Gries mergeable heavy-hitters: the PODS'12 guarantee must
  * hold for ANY chunking and merge order — that property is what
  * makes the q70 boolean gate deterministic despite order-dependent
  * raw estimates.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def sampled[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // zipf-ish skew: token k drawn with weight ∝ 1/(k+1)
  private val token: Gen[String] = Gen.frequency(
    (0 until 30).map(k => (30 - k, Gen.const(s"tok$k"))): _*)

  private def checkBound(stream: Seq[String], est: Map[String, Long], m: Int): Unit = {
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val slack = stream.size.toDouble / (m + 1)
    for ((tok, cnt) <- exact) {
      val e = est.getOrElse(tok, 0L)
      assert(e <= cnt, s"$tok overestimated: $e > $cnt")
      assert(cnt - e <= slack + 1e-9, s"$tok underestimated: $cnt - $e > $slack")
      if (cnt > slack) assert(est.contains(tok), s"heavy hitter $tok missing")
    }
  }

  test("property: bound holds under random chunking and merge order") {
    val agg = MisraGries(8)
    for (trial <- 1 to 20) {
      val stream = sampled(token, 500, 100L * trial)
      val nChunks = 1 + (trial % 7)
      val summaries = stream.grouped(math.max(1, stream.size / nChunks)).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      // fold merges in a rotated order so trees differ across trials
      val rotated = summaries.drop(trial % summaries.size) ++
        summaries.take(trial % summaries.size)
      val merged = rotated.reduce(agg.merge)
      assert(merged.size <= 8)
      checkBound(stream, merged, 8)
    }
  }

  test("udaf: distributed aggregation over a skewed column satisfies the bound") {
    val stream = sampled(token, 2000, 7L)
    val df = stream.toDF("tok").repartition(5)
    val est = df.agg(HeavyHitters.misraGries(8)($"tok"))
      .head().getMap[String, Long](0).toMap
    checkBound(stream, est, 8)
  }
}
