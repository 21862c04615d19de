package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed-matvec spectrum path ≡ driver path, bit-for-bit. */
class SpectrumPowerSpec extends SparkSpec {
  import spark.implicits._

  test("distributeCov model is bit-identical to the driver model") {
    // planted anisotropy: dim 0 dominates, some cross-correlation
    val rnd = new scala.util.Random(5)
    val dim = 16
    val emb = (0 until 120).map { _ =>
      val main = rnd.nextInt(64).toDouble / 16d
      Seq.tabulate(dim)(d =>
        (if (d == 0) main * 4
         else if (d == 1) main * 2 + rnd.nextInt(8) / 16d
         else rnd.nextInt(16) / 16d).toFloat)
    }.toDF("embedding").repartition(7)
    val a = Spectrum.topComponentModel(emb, "embedding", dim, iters = 25)
    val b = Spectrum.topComponentModel(emb, "embedding", dim, iters = 25,
      distributeCov = true)
    assert(a.mean9.toSeq === b.mean9.toSeq)
    assert(a.v.toSeq === b.v.toSeq)
    assert(a.lambda === b.lambda)
    assert(a.trace === b.trace)
    // sanity: the planted dominant direction leads the loading
    assert(math.abs(b.v(0)) > math.abs(b.v(2)))
  }

  test("fixed-point early exit is bit-identical to the full unroll, and actually triggers") {
    val rnd = new scala.util.Random(5)
    val dim = 16
    val emb = (0 until 120).map { _ =>
      val main = rnd.nextInt(64).toDouble / 16d
      Seq.tabulate(dim)(d =>
        (if (d == 0) main * 4
         else if (d == 1) main * 2 + rnd.nextInt(8) / 16d
         else rnd.nextInt(16) / 16d).toFloat)
    }.toDF("embedding").repartition(7)
    // once the 9-dp vector repeats, every later iteration is the
    // identity — so a 200-iteration ceiling returns the same model
    val a = Spectrum.topComponentModel(emb, "embedding", dim, iters = 25)
    val b = Spectrum.topComponentModel(emb, "embedding", dim, iters = 200)
    assert(a.v.toSeq === b.v.toSeq)
    assert(a.lambda === b.lambda)
    // and the distributed path runs FAR fewer matvec jobs than the
    // ceiling (the q192 cost trim): count jobs under a group
    val sc = spark.sparkContext
    sc.setJobGroup("specfix", "early-exit job count")
    val c = Spectrum.topComponentModel(emb, "embedding", dim, iters = 200,
      distributeCov = true)
    sc.clearJobGroup()
    assert(c.v.toSeq === a.v.toSeq)
    val jobs = sc.statusTracker.getJobIdsForGroup("specfix").length
    assert(jobs < 100,
      s"$jobs jobs for a 200-iteration ceiling — early exit did not trigger")
  }

  test("legacy decimal moments fallback (huge magnitudes) ≡ driver path") {
    // amax ≈ 1.4e4 → n·amax²·10¹² ≈ 10²² ≫ 2⁶² headroom, so the
    // distributed path must take the legacy DECIMAL(38,12) moments —
    // and still equal the driver model bit-for-bit
    val dim = 4
    val emb = (0 until 50).map(i =>
        Seq.tabulate(dim)(d => ((i % 7) * 2000 + d * 1000).toFloat))
      .toDF("embedding").repartition(3)
    val a = Spectrum.topComponentModel(emb, "embedding", dim, iters = 10)
    val b = Spectrum.topComponentModel(emb, "embedding", dim, iters = 10,
      distributeCov = true)
    assert(a.mean9.toSeq === b.mean9.toSeq)
    assert(a.v.toSeq === b.v.toSeq)
    assert(a.lambda === b.lambda)
    assert(a.trace === b.trace)
  }

  test("distributed path rejects malformed vectors like the driver path") {
    val bad = Seq(Seq(1f, 2f), Seq(1f, 2f, 3f)).toDF("embedding")
    val e = intercept[IllegalArgumentException] {
      Spectrum.topComponentModel(bad, "embedding", dim = 2, iters = 2,
        distributeCov = true)
    }
    assert(e.getMessage.contains("not length-2"), e.getMessage)
  }
}
