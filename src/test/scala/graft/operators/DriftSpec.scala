package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical snapshots have exactly zero KL and zero contributions") {
    val d = Seq("alpha beta gamma", "beta gamma delta", "alpha alpha beta")
      .toDF("text")
    val out = Drift.klDrift(d, d, "text", k = 10)
      .select("contrib", "kl_total").as[(Double, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (c, t) => c === 0.0 && t === 0.0 }, out.toSeq)
  }

  test("planted surge is the top contributor; KL positive") {
    val base = Seq.fill(50)("common words shared by both snapshots").toDF("text")
    val surged = base.union(Seq.fill(30)("surgetoken surgetoken").toDF("text"))
    val out = Drift.klDrift(surged, base, "text", k = 5)
      .select("token", "contrib", "kl_total").as[(String, Double, Double)].collect()
    assert(out.head._1 === "surgetoken", out.toSeq)
    assert(out.head._2 > 0.0 && out.head._3 > 0.0)
  }

  test("klAgainstReference: OOV events counted, excluded from KL; kl >= 0") {
    val ref = Seq(("a", 60L), ("b", 40L)).toDF("event_type", "ref_cnt")
    val groups = Seq(
      ("w1", "a", 6L), ("w1", "b", 4L),              // matches ref -> kl = 0
      ("w2", "a", 6L), ("w2", "b", 4L), ("w2", "zz", 5L), // 5 OOV events
      ("w3", "zz", 7L)                                // entirely OOV
    ).toDF("win", "event_type", "n")
    val out = Drift.klAgainstReference(groups, "win", "event_type", "n",
        ref, "ref_cnt")
      .orderBy("win")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) ===
      Seq(("w1", 10L, 0L), ("w2", 10L, 5L), ("w3", 0L, 7L)))
    // w2's in-vocab counts are identical to w1's, so with OOV mass
    // excluded from the total they must score the SAME kl — and every
    // kl (including the all-OOV group's smoothed-uniform-vs-ref) is a
    // true KL, never negative
    assert(out(0)._4 === out(1)._4, out)
    assert(out.forall(_._4 >= 0.0), out)
  }

  test("bit-identical at any partitioning") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    def snap(n: Int) = Seq.fill(n)(
      Seq.fill(5 + rnd.nextInt(10))(vocab(rnd.nextInt(6))).mkString(" "))
    val a = snap(40)
    val b = snap(40)
    def run(parts: Int) = Drift.klDrift(
        a.toDF("text").repartition(parts), b.toDF("text").repartition(parts),
        "text", k = 6)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(run(1) === run(7))
  }
}
