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
