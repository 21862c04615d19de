package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltIvfSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct stays within its rsd bound of the exact count") {
    val df = Seq.tabulate(20000)(i => i % 1777).toDF("v")
    val (approx, exact) = df
      .agg(approx_count_distinct($"v", 0.02).as("a"), countDistinct($"v").as("e"))
      .as[(Long, Long)].head()
    assert(exact === 1777L)
    // HLL++ at rsd=0.02: allow 5 sigma
    assert(math.abs(approx - exact) <= (exact * 0.1).toLong)
  }

  test("salted sum is BIT-identical to the single-phase exact sum") {
    // non-dyadic decimals: any double roundtrip between the phases
    // would drift in the low bits
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(4000)(("k" + rnd.nextInt(3),
      math.floor(rnd.nextDouble() * 1e6) / 100)).toDF("k", "v")
    val salted = Salt.saltedSum(df, Seq("k"), "v", factor = 16)
      .orderBy("k").select("v").as[Double].collect().toSeq
    val direct = df.groupBy("k").agg(graft.core.Exact.dsum($"v").as("v"))
      .orderBy("k").select("v").as[Double].collect().toSeq
    assert(salted.map(java.lang.Double.doubleToLongBits) ===
      direct.map(java.lang.Double.doubleToLongBits))
  }

  test("salted sum equals direct sum (hot key sprayed over sub-keys)") {
    val df = (Seq.fill(5000)(("hot", 1.5)) ++ Seq(("cold", 2.0), ("cold", 3.0)))
      .toDF("k", "v")
    val out = Salt.saltedSum(df, Seq("k"), "v", factor = 8)
      .orderBy("k").select("k", "v").as[(String, Double)].collect().toSeq
    assert(out === Seq(("cold", 5.0), ("hot", 7500.0)))
    // phase-1 really sprays: distinct (key, salt) groups > distinct keys
    val sprayed = df.withColumn("_salt", pmod(hash(df.columns.map(col): _*), lit(8)))
      .select("k", "_salt").distinct().count()
    assert(sprayed > 2)
  }

  test("IVF top-k: finds the exact nearest neighbor for clustered vectors") {
    // two tight clusters far apart; nearest neighbor of each query is
    // its own cluster-mate, which shares the query's argmax cell
    def v(base: Float, i: Int) = Array.tabulate(8)(j => base + (if (j == i % 8) 0.01f else 0f))
    val corpus = ((0 until 10).map(i => (i.toLong, v(1.0f, i))) ++
      (10 until 20).map(i => (i.toLong, v(-1.0f, i)))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id".isin(0L, 10L))
    val exact = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val ivf = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
      dim = 8, k = 1, nCentroids = 4, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(ivf === exact)
  }
}
