package graft.operators

import graft.SparkSpec
import graft.core.OpCache
import scala.util.Random

/** Integer-exact PageRank: the operator must agree BIT-FOR-BIT with a
  * driver-side replay of the scaled recurrence on arbitrary graphs
  * (that exactness is what lets q98 ride the hash gate), and its
  * per-round checkpoints must follow the componentsStar lifecycle —
  * interior rounds freed eagerly, only the final round surviving
  * until the pipeline-boundary release.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Reference replay: plain-Scala fold of the documented recurrence. */
  private def reference(edges: Seq[(Long, Long)], iters: Int, scale: Long): Map[Long, Long] = {
    val e = edges.filter { case (u, v) => u != v }.distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val verts = (e.map(_._1) ++ e.map(_._2)).distinct
    val base = 15L * scale / 100L
    var r = verts.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = verts.map(v => v -> (base + 85L * in.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("3-cycle: symmetric graph converges to equal ranks = scale") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 5)
    // every vertex has outdeg 1 and one incoming edge: rank stays
    // base + 85% of scale = 150e9 + 850e9 = scale (minus trunc dust)
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.toSet.size == 1, "cycle ranks must be equal")
    val r = got(1L)
    assert(math.abs(r - 1000000000000L) < 10L, s"cycle rank drifted: $r")
  }

  test("hub: all-point-to-one concentrates rank on the sink") {
    val got = run(Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L)), 5)
    assert(got(9L) > got(1L) && got(1L) > got(2L))
    assert(got(2L) == got(3L), "symmetric leaves must tie exactly")
  }

  test("property: operator ≡ driver replay on random graphs, any partitioning") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 20 + rnd.nextInt(30)
      val edges = Seq.fill(3 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (u, v) => u != v }
      val exp = reference(edges, 4, 1000000000000L)
      val got = PageRank.pageRank(
        edges.toDF("src", "dst").repartition(1 + trial),
        "src", "dst", iterations = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == exp, s"trial $trial: operator diverged from replay")
    }
  }

  test("checkpoint lifecycle: interior rounds freed, release drops the rest") {
    OpCache.release(blocking = true)
    val base = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val out = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)), 6)
    assert(out.nonEmpty)
    val alive = spark.sparkContext.getPersistentRDDs.keySet.toSet -- base
    // edges + outdeg + vertices persists and the final round's
    // checkpoint — interior rounds (6 of them) must already be gone
    assert(alive.size <= 4,
      s"interior PageRank rounds must be freed eagerly, saw ${alive.size} blocks")
    OpCache.release(blocking = true)
    val after = spark.sparkContext.getPersistentRDDs.keySet.toSet -- base
    assert(after.isEmpty, s"release must free every PageRank block, saw $after")
  }

  test("overflow contract: a hub larger than the scale's headroom throws, never wraps") {
    // scale 10^17: a 200-in-degree hub makes 85·Σcontrib exceed 2^63 —
    // the ANSI multiply must throw SparkArithmeticException (callers
    // pick a smaller scale per the scaladoc), not wrap silently
    val edges = (1L to 200L).map(i => (i, 0L))
    val e = intercept[Exception] {
      PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iterations = 2, scale = 100000000000000000L).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getClass.getSimpleName == "SparkArithmeticException"
        || Option(c.getMessage).exists(_.contains("ARITHMETIC_OVERFLOW"))),
      s"expected ARITHMETIC_OVERFLOW in the cause chain, got $e")
    graft.core.OpCache.release(blocking = true)
  }
}
