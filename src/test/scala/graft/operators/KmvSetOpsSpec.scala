package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSetOpsSpec extends SparkSpec {
  import spark.implicits._

  private def est(a: Seq[String], b: Seq[String], k: Int, parts: Int = 2) = {
    val sa = KmvSetOps.kmvSketch(a.toDF("v").repartition(parts), col("v"), k)
    val sb = KmvSetOps.kmvSketch(b.toDF("v").repartition(parts), col("v"), k)
    KmvSetOps.overlapEstimate(sa, sb, k)
      .select("union_est", "jaccard_est", "intersection_est")
      .as[(Double, Double, Double)].head()
  }

  test("known 50% overlap: estimates land near truth at k=256") {
    val shared = (0 until 2000).map(i => s"shared$i")
    val a = shared ++ (0 until 2000).map(i => s"onlya$i")
    val b = shared ++ (0 until 2000).map(i => s"onlyb$i")
    val (u, j, inter) = est(a, b, 256)
    // truth: union 6000, jaccard 1/3, intersection 2000
    assert(math.abs(u - 6000) < 6000 * 0.2, s"union_est $u")
    assert(math.abs(j - 1.0 / 3) < 0.12, s"jaccard_est $j")
    assert(math.abs(inter - 2000) < 2000 * 0.45, s"intersection_est $inter")
  }

  test("disjoint sets estimate zero intersection; identical sets estimate jaccard 1") {
    val a = (0 until 3000).map(i => s"x$i")
    val b = (0 until 3000).map(i => s"y$i")
    val (_, j0, i0) = est(a, b, 128)
    assert(j0 === 0.0 && i0 === 0.0)
    val (_, j1, _) = est(a, a, 128)
    assert(j1 === 1.0)
  }

  test("small sets fall back to the exact merged count; partitioning-invariant") {
    val a = Seq("p", "q", "r")
    val b = Seq("q", "r", "s")
    val (u, j, inter) = est(a, b, 128, parts = 1)
    assert(u === 4.0) // exact fallback: merged distinct hashes
    assert(j === 0.5 && inter === 2.0)
    assert(est(a, b, 128, parts = 1) === est(a, b, 128, parts = 7))
  }

  test("overlapMatrix: pair rows agree with the pairwise overlapEstimate") {
    val rows =
      (0 until 900).map(i => ("a", s"s$i")) ++
      (0 until 900).map(i => ("b", s"s${i + 450}")) ++   // 50% overlap with a
      (0 until 900).map(i => ("c", s"zz$i"))             // disjoint
    val df = rows.toDF("src", "v").repartition(5)
    val sk = KmvSetOps.groupedKmvSketch(df, col("src"), col("v"), 64)
    val m = KmvSetOps.overlapMatrix(sk, 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Double]("union_est"), r.getAs[Double]("jaccard_est")))).toMap
    assert(m.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    def one(x: String, y: String) = {
      val sa = KmvSetOps.kmvSketch(
        rows.filter(_._1 == x).map(_._2).toDF("v"), col("v"), 64)
      val sb = KmvSetOps.kmvSketch(
        rows.filter(_._1 == y).map(_._2).toDF("v"), col("v"), 64)
      KmvSetOps.overlapEstimate(sa, sb, 64)
        .select("union_est", "jaccard_est")
        .as[(Double, Double)].head()
    }
    // matrix rows must EQUAL the two-set estimator on the same sketches
    assert(m(("a", "b")) === one("a", "b"))
    assert(m(("a", "c")) === one("a", "c"))
    // and the planted structure reads through: ab overlaps, ac does not
    assert(m(("a", "b"))._2 > 0.15, s"ab ${m(("a", "b"))}")
    assert(m(("a", "c"))._2 === 0.0, s"ac ${m(("a", "c"))}")
  }
}
