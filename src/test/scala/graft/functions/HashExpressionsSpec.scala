package graft.functions

import graft.SparkSpec
import graft.operators.NearDup
import org.apache.spark.sql.functions._

class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c",
    "single",
    "repeated repeated repeated words words",
  )

  test("native minhash signature ≡ HOF formulation (bit-identical)") {
    val df = samples.toDF("t").select(NearDup.shingles($"t", 2).as("sh"))
    val both = df.select(
      NearDup.minhashSignature($"sh", 16).as("native"),
      NearDup.minhashSignatureHof($"sh", 16).as("hof")
    ).as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (n, h) => assert(n === h) }
  }

  test("native simhash64 ≡ HOF formulation (bit-identical)") {
    val df = samples.toDF("t")
    val both = df.select(
      NearDup.simhash64($"t").as("native"),
      NearDup.simhash64Hof($"t").as("hof")
    ).as[(Long, Long)].collect()
    both.foreach { case (n, h) => assert(n === h) }
  }
}
