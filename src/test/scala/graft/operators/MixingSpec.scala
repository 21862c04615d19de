package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def quotas(counts: Seq[(String, Long)], alpha: Double, budget: Int): Map[String, (Long, Long)] =
    Mixing.alphaQuotas(counts.toDF("lang", "n"), "lang", alpha, budget)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  /** Driver replay of the integer largest-remainder allocation. */
  private def replay(counts: Seq[(String, Long)], alpha: Double, budget: Int): Map[String, Long] = {
    val w = counts.map { case (k, n) =>
      k -> BigDecimal(math.pow(n.toDouble, alpha) * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val tw = w.map(_._2).sum
    val base = w.map { case (k, wk) => (k, budget * wk / tw, budget * wk - (budget * wk / tw) * tw) }
    val left = budget - base.map(_._2).sum
    val bump = base.sortBy { case (k, _, r) => (-r, k) }.take(left.toInt).map(_._1).toSet
    val n = counts.toMap
    base.map { case (k, q, _) =>
      k -> math.min(n(k), q + (if (bump(k)) 1L else 0L))
    }.toMap
  }

  test("largest-remainder allocation ≡ driver replay; quotas sum to the budget") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 5) {
      val counts = ('a' to ('a' + 3 + rnd.nextInt(5)).toChar)
        .map(c => (c.toString, 10L + rnd.nextInt(5000)))
      val got = quotas(counts, 0.3, 100)
      val exp = replay(counts, 0.3, 100)
      assert(got.view.mapValues(_._2).toMap === exp, s"trial $trial")
      assert(got.values.map(_._2).sum === 100L, s"trial $trial budget not exhausted")
    }
  }

  test("alpha=1 is proportional, alpha=0 is equal shares; alpha=0.3 upweights low-resource") {
    val counts = Seq(("big", 9000L), ("small", 100L))
    val p1 = quotas(counts, 1.0, 91)
    assert(p1("big")._2 === 90L && p1("small")._2 === 1L)
    val p0 = quotas(counts, 0.0, 10)
    assert(p0("big")._2 === 5L && p0("small")._2 === 5L)
    val p3 = quotas(counts, 0.3, 100)
    // 100^0.3 / 9000^0.3 ≈ 0.26 — far above the raw 100/9000 ≈ 0.011
    assert(p3("small")._2 > 15L,
      s"alpha=0.3 must upweight the low-resource domain: $p3")
  }

  test("quota caps at domain size; draw is exact, deterministic, partitioning-invariant") {
    val docs = (Seq.tabulate(50)(i => ("big", i.toLong, s"doc number $i body")) ++
      Seq.tabulate(3)(i => ("tiny", 100L + i, s"tiny $i"))).toDF("lang", "doc_id", "text")
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val q = Mixing.alphaQuotas(counts, "lang", 0.0, 20) // equal shares: 10 each
    val qm = q.as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(qm("tiny") === 3L, s"quota must cap at domain size: $qm") // capped from 10
    val h = conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long")
    def draw(parts: Int) = Mixing.sampleQuotas(
        docs.repartition(parts), "lang", "doc_id", h, q, maxQuota = 20)
      .select("lang", "pick", "doc_id").as[(String, Long, Long)]
      .collect().sorted.toSeq
    val d1 = draw(1)
    assert(d1 === draw(7))
    assert(d1.count(_._1 == "tiny") === 3 && d1.count(_._1 == "big") === 10)
  }
}
