package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FingerprintExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("native expression ≡ higher-order-function formulation") {
    GraftFunctions.register(spark)
    val samples = Seq("", "a", "hello world", "the quick brown fox",
      "x" * 500, "punctuation, and; symbols!", "ünïcödé ↦ text")
    val df = samples.toDF("t")
    val both = df.select(
      call_function("graft_fingerprint", $"t").as("native"),
      Text.fingerprint($"t").as("hof")
    ).as[(Long, Long)].collect()
    both.foreach { case (n, h) => assert(n === h) }
  }

  test("SQL-registered and codegen path works end-to-end") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_fingerprint('hello world') AS fp")
      .as[Long].head()
    val expect = Seq("hello world").toDF("t")
      .select(Text.fingerprint($"t")).as[Long].head()
    assert(r === expect)
    // type error surfaces at analysis, not execution
    val e = intercept[Exception](spark.sql("SELECT graft_fingerprint(42)").collect())
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
