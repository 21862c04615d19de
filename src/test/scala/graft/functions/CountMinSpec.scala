package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Count-min sketch: never undercounts (unconditional), merge is
  * exact element-wise addition (so ANY chunking/merge order yields
  * the SAME matrix — stronger than Misra-Gries' order-dependent
  * estimates), and the declarative SQL probe ([[CountMin.estimate]])
  * is bit-identical to the aggregator's update hash.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def sampled[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val token: Gen[String] = Gen.frequency(
    (0 until 30).map(k => (30 - k, Gen.const(s"tok$k"))): _*)

  private def estimate(m: Seq[Seq[Long]], item: String, agg: CountMinSketch): Long = {
    // re-derive indices through the aggregator's own path: update a
    // fresh sketch with the item and find which cells moved
    val probe = agg.reduce(agg.zero, item)
    (0 until agg.depth).map { i =>
      val j = (0 until agg.width).find(j => probe(i * agg.width + j) == 1L).get
      m(i)(j)
    }.min
  }

  test("property: sketch is order/chunking-invariant and never undercounts") {
    val agg = CountMinSketch(4, 64)
    for (trial <- 1 to 10) {
      val stream = sampled(token, 400, 300L * trial)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val whole = stream.foldLeft(agg.zero)(agg.reduce)
      val nChunks = 1 + (trial % 5)
      val chunks = stream.grouped(math.max(1, stream.size / nChunks)).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val rotated = chunks.drop(trial % chunks.size) ++ chunks.take(trial % chunks.size)
      val merged = rotated.reduce(agg.merge)
      assert(merged.toSeq == whole.toSeq, "merge must equal single-pass exactly")
      val m = agg.finish(merged)
      for ((tok, cnt) <- exact) {
        val e = estimate(m, tok, agg)
        assert(e >= cnt, s"$tok undercounted: $e < $cnt")
        // deterministic ε·N overcount check on this fixed data
        assert(e - cnt <= math.ceil(math.E / 64 * stream.size).toLong + 1,
          s"$tok overcount outside ε·N: $e vs $cnt over n=${stream.size}")
      }
    }
  }

  test("udaf + SQL probe: estimate() matches the aggregator's hash exactly") {
    val d = 4; val w = 64
    val agg = CountMinSketch(d, w)
    val stream = sampled(token, 1500, 11L)
    val df = stream.toDF("tok").repartition(7)
    val sketch = df.agg(CountMin.countMin(d, w)($"tok").as("_cms"))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probes = exact.keys.toSeq.sorted.toDF("tok")
    val got = probes.crossJoin(broadcast(sketch))
      .select($"tok", CountMin.estimate($"_cms", $"tok", d, w).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // driver-side replay through the aggregator must agree cell-for-cell
    val m = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
    for ((tok, cnt) <- exact) {
      assert(got(tok) == estimate(m, tok, agg),
        s"SQL probe diverges from aggregator hash for $tok")
      assert(got(tok) >= cnt)
    }
  }
}
