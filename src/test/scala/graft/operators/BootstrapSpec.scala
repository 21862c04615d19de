package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def ci(n: Int, seed: Int, parts: Int = 2): (Long, Double, Double, Double) = {
    val rnd = new scala.util.Random(seed)
    val df = Seq.tabulate(n)(i => (i.toLong, 10.0 + rnd.nextGaussian()))
      .toDF("id", "v").repartition(parts)
    Bootstrap.meanCi(df, col("id"), col("v"), replicates = 32, alpha = 0.05)
      .as[(Long, Double, Double, Double)].head()
  }

  test("interval brackets the point estimate; width shrinks with n") {
    val (n1, m1, lo1, hi1) = ci(200, 7)
    assert(n1 === 200L && lo1 <= m1 && m1 <= hi1, s"($m1, $lo1, $hi1)")
    val (_, _, lo2, hi2) = ci(3200, 7)
    // 16× the data → ~4× narrower interval; allow slack
    assert((hi2 - lo2) < (hi1 - lo1) / 2,
      s"width must shrink: ${hi1 - lo1} -> ${hi2 - lo2}")
  }

  test("bit-identical at any partitioning (content-keyed weights)") {
    assert(ci(500, 11, parts = 1) === ci(500, 11, parts = 7))
  }

  test("Poisson weights: CDF thresholds well-formed, mean weight near 1") {
    val cdf = Bootstrap.PoissonCdf
    assert(cdf.size === 6 && cdf.zip(cdf.tail).forall(p => p._1 < p._2))
    assert(math.abs(cdf.head - math.exp(-1.0)) < 1e-15)
    assert(cdf.last > 0.999)
    val w = Seq.tabulate(4000)(i => (i.toLong, 1.0)).toDF("id", "v")
      .select(Bootstrap.poissonWeight(
        (conv(substring(md5(col("id").cast("string")), 1, 12), 16, 10)
          .cast("double") + 0.5) / lit(281474976710656.0)).as("w"))
      .agg(avg(col("w"))).as[Double].head()
    assert(math.abs(w - 1.0) < 0.05, s"mean Poisson weight $w")
  }
}
