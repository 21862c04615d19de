package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The [[DotExactKernel]] fast quantization path must be BIT-IDENTICAL
  * to the original Spark `Decimal(Double)` string-parsing path — the
  * fast path answers only when floor/ceil provably match the
  * string-rounded result and defers to [[DotExactKernel.quantSlow]]
  * otherwise, so any disagreement here is a broken margin bound (a
  * silent oracle-hash break across every similarity query).
  *
  * No SparkSession needed: both paths are pure JVM functions.
  */
class DotExactQuantSpec extends AnyFunSuite {

  private def check(p: Double): Unit = {
    val fast = DotExactKernel.quantUnscaledOrSkip(p)
    val slow = DotExactKernel.quantSlow(p)
    assert(fast === slow, s"quant mismatch at p=$p (${java.lang.Double.toHexString(p)})")
  }

  test("float-product sweep: 1M random float pairs, fast ≡ slow") {
    val rnd = new java.util.Random(42)
    var i = 0
    while (i < 1000000) {
      val p = rnd.nextFloat().toDouble * (rnd.nextFloat() * 2 - 1)
      check(p)
      i += 1
    }
  }

  test("unit-scale embedding products (the real input regime)") {
    val rnd = new java.util.Random(7)
    var i = 0
    while (i < 200000) {
      // N(0,1)/8-ish components, as the embeddings table carries
      val a = (rnd.nextGaussian() / 8).toFloat
      val b = (rnd.nextGaussian() / 8).toFloat
      check(a.toDouble * b.toDouble)
      i += 1
    }
  }

  test("adversarial near-boundary values: k + 0.5 ± ε at scale 12") {
    val rnd = new java.util.Random(13)
    for (_ <- 0 until 50000) {
      val k = rnd.nextInt(1000000).toLong
      val base = (k + 0.5) / 1e12 * (if (rnd.nextBoolean()) 1 else -1)
      // walk ulps around the exact half boundary — the window where
      // string-rounding and binary-rounding can disagree
      var p = base
      for (_ <- 0 until 4) { check(p); p = Math.nextUp(p) }
      p = base
      for (_ <- 0 until 4) { check(p); p = Math.nextDown(p) }
    }
  }

  test("exact grid points, zeros, denormals, large magnitudes") {
    check(0.0); check(-0.0)
    check(java.lang.Double.MIN_VALUE); check(-java.lang.Double.MIN_VALUE)
    for (k <- -1000 to 1000) check(k / 1e12)
    // magnitudes spanning the fast-path cutoff and the precision-18 skip
    for (e <- -20 to 20; s <- Seq(1.0, -1.0)) {
      check(s * math.pow(10, e))
      check(s * (math.pow(10, e) * 1.23456789012345))
    }
    // just below/above the 4.6e17 scaled cutoff and the 1e18 skip line
    for (v <- Seq(4.5e5, 4.7e5, 9.9e5, 1.1e6, 1e7); s <- Seq(1.0, -1.0))
      check(s * v)
  }

  test("dot() end-to-end unchanged on a fixed vector pair") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rnd = new java.util.Random(99)
    val a = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val b = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val ad = ArrayData.toArrayData(a)
    val bd = ArrayData.toArrayData(b)
    // reference result via the slow path only
    var sum = 0L
    for (i <- 0 until 64) {
      val u = DotExactKernel.quantSlow(a(i).toDouble * b(i).toDouble)
      if (u != Long.MinValue) sum += u
    }
    val expected = org.apache.spark.sql.types.Decimal(sum, 38, 12).toDouble
    assert(DotExactKernel.dot(ad, bd) === expected)
  }
}
