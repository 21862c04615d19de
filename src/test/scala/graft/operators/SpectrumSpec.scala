package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpectrumSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-noise in [-a, a] from (i, tag). */
  private def noise(i: Int, tag: Int, a: Double): Double =
    a * (((i * 2654435761L + tag * 40503L) % 1000) / 500.0 - 1.0)

  test("planted dominant direction: loading, lambda1, share") {
    // dim 4: x = (s, 0.05*n1, 0.05*n2, 0.05*n3), s = +/-1 alternating
    val rows = (0 until 400).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array(s,
        (0.05 * noise(i, 1, 1)).toFloat,
        (0.05 * noise(i, 2, 1)).toFloat,
        (0.05 * noise(i, 3, 1)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val rep = Spectrum.topComponentReport(df, "embedding", dim = 4)
      .orderBy("dim").collect()
    val loading = rep.map(_.getAs[Double]("loading"))
    val lambda1 = rep.head.getAs[Double]("lambda1")
    val share = rep.head.getAs[Double]("explained_share")
    // variance along dim 0 is exactly 1 (mean 0, s^2 = 1)
    assert(math.abs(math.abs(loading(0)) - 1.0) < 1e-3,
      s"dominant loading ${loading.toSeq}")
    assert(loading.drop(1).forall(l => math.abs(l) < 0.05))
    assert(math.abs(lambda1 - 1.0) < 0.01, s"lambda1 $lambda1")
    assert(share > 0.99, s"share $share")
  }

  test("trace equals the sum of per-dim variances; isotropy splits the share") {
    // two independent +/-1 dims: variance 1 each, trace 2, lambda1 ~ 1
    val rows = (0 until 400).map { i =>
      (i.toLong, Array(
        (if (i % 2 == 0) 1.0 else -1.0).toFloat,
        (if (i % 4 < 2) 1.0 else -1.0).toFloat))
    }
    val rep = Spectrum.topComponentReport(rows.toDF("vec_id", "embedding"),
      "embedding", dim = 2).orderBy("dim").collect()
    val trace = rep.head.getAs[Double]("trace")
    val share = rep.head.getAs[Double]("explained_share")
    assert(math.abs(trace - 2.0) < 1e-6, s"trace $trace")
    assert(share > 0.45 && share < 0.55, s"share $share")
  }

  test("report is partitioning-invariant bit-for-bit") {
    val rows = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(6)(d => noise(i, d, 1).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val a = Spectrum.topComponentReport(df, "embedding", dim = 6)
      .orderBy("dim").collect().map(_.toSeq).toSeq
    val b = Spectrum.topComponentReport(df.repartition(13), "embedding", dim = 6)
      .orderBy("dim").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("removeTopReport: dominant-direction vectors carry top_share ~ 1") {
    val rows = (0 until 400).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array(s,
        (0.05 * noise(i, 1, 1)).toFloat,
        (0.05 * noise(i, 2, 1)).toFloat,
        (0.05 * noise(i, 3, 1)).toFloat))
    }
    val rep = Spectrum.removeTopReport(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dim = 4).collect()
    assert(rep.length === 400)
    rep.foreach { r =>
      val proj = r.getAs[Double]("proj")
      val norm2 = r.getAs[Double]("norm2")
      val share = r.getAs[Double]("top_share")
      assert(share >= 0.0 && share <= 1.0 + 1e-9, s"share $share")
      assert(share > 0.99, s"dominant share $share")
      // the decomposition is consistent: proj^2 <= norm2
      assert(proj * proj <= norm2 + 1e-9)
    }
  }

  test("removeTopReport: isotropic two-dim corpus splits the share") {
    val rows = (0 until 400).map { i =>
      (i.toLong, Array(
        (if (i % 2 == 0) 1.0 else -1.0).toFloat,
        (if (i % 4 < 2) 1.0 else -1.0).toFloat))
    }
    val rep = Spectrum.removeTopReport(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dim = 2).collect()
    // degenerate spectrum: the all-ones start converges to v ∝ (1,1),
    // so corners (1,1)/(−1,−1) project fully (share 1) and
    // (1,−1)/(−1,1) are orthogonal (share 0) — the MEAN share is 1/2
    val shares = rep.map(_.getAs[Double]("top_share"))
    shares.foreach(s0 =>
      assert(s0 < 1e-6 || s0 > 1.0 - 1e-6, s"corner share $s0"))
    val mean = shares.sum / shares.length
    assert(mean > 0.45 && mean < 0.55, s"mean share $mean")
  }

  test("malformed embeddings are rejected, not silently skewing the moments") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, null.asInstanceOf[Array[Float]]),
      (3L, Array(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Spectrum.topComponentReport(df, "embedding", dim = 2)
    }
    assert(e.getMessage.contains("2 of 3"), e.getMessage)
  }

  test("mean is the 9-dp decimal-exact column mean") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(2.0f, 6.0f)),
      (3L, Array(3.0f, 1.0f))).toDF("vec_id", "embedding")
    val rep = Spectrum.topComponentReport(df, "embedding", dim = 2)
      .orderBy("dim").collect()
    assert(rep.map(_.getAs[Double]("mean")).toSeq === Seq(2.0, 3.0))
  }
}
