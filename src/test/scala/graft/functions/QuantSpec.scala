package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Int8 quantization kernels (QuantExpressions) + the exactness
  * contract of Similarity.quantizedTopK: the quantized estimate ±
  * analytic bound must bracket the true dot product on EVERY pair
  * (that containment is what makes the banded prune lossless), and
  * the full operator must reproduce bruteForceTopK(exact = true)
  * bit-for-bit.
  */
class QuantSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.QuantExpressions._

  private def sampled[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // embedding-shaped vectors: mixed-sign floats around unit scale,
  // plus the degenerate cases (all-zero, single spike, tiny values)
  private val vec: Gen[Seq[Float]] =
    Gen.listOfN(16, Gen.chooseNum(-1.0f, 1.0f))
  private val edgeVecs: Seq[Seq[Float]] = Seq(
    Seq.fill(16)(0.0f),                        // all-zero → scale 0
    Seq.fill(15)(0.0f) :+ 3.5f,                // one spike
    Seq.fill(16)(1e-8f),                       // tiny uniform
    Seq.tabulate(16)(i => if (i % 2 == 0) 127.0f else -127.0f))

  test("quantize: bytes in [-127,127], reconstruction error ≤ scale/2 per element") {
    val df = (sampled(vec, 200, 11L) ++ edgeVecs).toDF("v")
      .select(col("v").cast("array<float>").as("v"))
      .select(col("v"), i8Scale(col("v")).as("s"), i8Quantize(col("v")).as("q"))
    val bad = df.filter(
      exists(col("q"), b => abs(b) > 127) ||
        exists(zip_with(col("v"), col("q"),
            (x, b) => abs(x.cast("double") - col("s") * b.cast("double"))),
          e => e > col("s") * 0.5 + 1e-12)).count()
    assert(bad === 0L)
  }

  test("estimate ± bound brackets the true dot product on every random pair") {
    val pairs = sampled(for { a <- vec; b <- vec } yield (a, b), 300, 12L)
    val df = pairs.toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
      .select(
        Similarity.dotExact(col("a"), col("b")).as("dt"),
        (i8Scale(col("a")) * i8Scale(col("b")) *
          i8Dot(i8Quantize(col("a")), i8Quantize(col("b"))).cast("double")).as("est"),
        (i8Scale(col("a")) * i8Scale(col("b")) *
          (i8AbsSum(i8Quantize(col("a"))).cast("double") / 2 +
            i8AbsSum(i8Quantize(col("b"))).cast("double") / 2 +
            size(col("a")).cast("double") / 4)).as("bnd"))
    val bad = df.filter(abs(col("dt") - col("est")) > col("bnd") + 1e-9).count()
    assert(bad === 0L)
  }

  test("i8 dot/abssum agree with HOF formulations") {
    val pairs = sampled(for { a <- vec; b <- vec } yield (a, b), 200, 13L)
    val df = pairs.toDF("a", "b")
      .select(i8Quantize(col("a").cast("array<float>")).as("qa"),
        i8Quantize(col("b").cast("array<float>")).as("qb"))
    val bad = df.filter(
      not(i8Dot(col("qa"), col("qb")) <=>
        aggregate(zip_with(col("qa"), col("qb"), (x, y) => x.cast("long") * y.cast("long")),
          lit(0L), (s, v) => s + v)) ||
        not(i8AbsSum(col("qa")) <=>
          aggregate(col("qa"), lit(0L), (s, v) => s + abs(v.cast("long"))))).count()
    assert(bad === 0L)
  }

  test("quantizedTopK ≡ bruteForceTopK(exact) — same rows, sims, ranks") {
    val corpus = (sampled(vec, 120, 14L) ++ edgeVecs).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val queries = corpus.filter(col("vec_id") < 20)
    val expected = Similarity.bruteForceTopK(
      queries, corpus, "vec_id", "embedding", k = 5, roundDp = -1, exact = true)
    val got = Similarity.quantizedTopK(
      queries, corpus, "vec_id", "embedding", k = 5, roundDp = -1)
    assert(got.exceptAll(expected).count() === 0L)
    assert(expected.exceptAll(got).count() === 0L)
    spark.catalog.clearCache()
  }
}
