package graft.functions

import graft.SparkSpec
import graft.operators.{NearDup, Salt}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based equivalence: every native codegen kernel must agree
  * with its HOF "executable spec" on ScalaCheck-generated inputs (the
  * unit suites pin hand-picked cases; these sweep the input space with
  * a FIXED seed so failures replay deterministically). Generation is
  * batched into one DataFrame per property — one Spark job each, not
  * one per sample.
  */
class NativeKernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sampled[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // tokens/texts shaped like the corpus: short alphanumeric words,
  // empty and single-token texts included (the edge cases)
  private val token = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(6))
  private val text = Gen.listOf(token).map(_.mkString(" "))

  test("property: shingles native ≡ HOF spec over 200 random texts × n ∈ {1,2,3,5}") {
    val df = sampled(text, 200, 1L).toDF("text")
    for (n <- Seq(1, 2, 3, 5)) {
      val bad = df.select(NearDup.shingles($"text", n).as("a"),
          NearDup.shinglesHof($"text", n).as("b"))
        .filter(not($"a" <=> $"b")).count()
      assert(bad === 0L, s"shingle mismatch at n=$n")
    }
  }

  test("property: jaccard native ≡ HOF spec over random shingle-array pairs") {
    val pairs = sampled(for { a <- text; b <- text } yield (a, b), 200, 2L)
    val bad = pairs.toDF("ta", "tb")
      .select(NearDup.shingles($"ta", 2).as("sa"), NearDup.shingles($"tb", 2).as("sb"))
      .select(NearDup.jaccard($"sa", $"sb").as("a"), NearDup.jaccardHof($"sa", $"sb").as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(bad === 0L)
  }

  test("property: minhash signature native ≡ HOF spec (16 hashes) over random texts") {
    val df = sampled(text.suchThat(_.nonEmpty), 100, 3L).toDF("text")
      .select(NearDup.shingles($"text", 2).as("_sh"))
    val bad = df.select(NearDup.minhashSignature($"_sh", 16).as("a"),
        NearDup.minhashSignatureHof($"_sh", 16).as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(bad === 0L)
  }

  test("property: salted two-phase sum is bit-identical to the single-phase decimal sum") {
    val rows = sampled(for {
      k <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.chooseNum(-1e6, 1e6)
    } yield (k, v), 500, 7L)
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k").agg(graft.core.Exact.dsum($"v").as("v"))
      .as[(String, Double)].collect().toMap
    for (factor <- Seq(1, 3, 16)) {
      val salted = Salt.saltedSum(df, Seq("k"), "v", factor)
        .as[(String, Double)].collect().toMap
      // bit-identical, not approximately equal: the decimal partials
      // make the two-phase sum exactly associative at ANY spray factor
      assert(salted === plain, s"factor=$factor")
    }
  }
}
