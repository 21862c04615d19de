package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NegativeSampling (unigram^(3/4) inverse-CDF draws). */
class NegativeSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("draw frequencies track the unigram^(3/4) distribution") {
    // 'hot' appears 81x, 'cold' 1x: weights 27 vs 1 -> hot should get
    // ~27/28 of the draws
    val docs = Seq((("hot " * 81) + "cold").trim).toDF("text")
    val model = NegativeSampling.fitModel(docs, "text", "sT")
    val draws = NegativeSampling.sampleTable(spark, model, 2000)
      .groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hot = draws.getOrElse("hot", 0L).toDouble / 2000
    assert(hot > 0.90 && hot < 0.99, s"hot share $hot, draws $draws")
    assert(draws.getOrElse("cold", 0L) > 0, s"cold never drawn: $draws")
  }

  test("draws are a pure function of (seed, k): reruns and partitions agree") {
    val docs = Seq("a b c d e a b a").toDF("text")
    val m = NegativeSampling.fitModel(docs, "text", "sP")
    val t1 = NegativeSampling.sampleTable(spark, m, 200)
      .orderBy("draw").collect().map(_.getString(1)).toSeq
    val t2 = NegativeSampling.sampleTable(spark, m, 200).repartition(7)
      .orderBy("draw").collect().map(_.getString(1)).toSeq
    assert(t1 === t2)
    val m2 = NegativeSampling.fitModel(docs, "text", "sQ")
    val t3 = NegativeSampling.sampleTable(spark, m2, 200)
      .orderBy("draw").collect().map(_.getString(1)).toSeq
    assert(t1 !== t3, "different seeds must permute the draws")
  }

  test("vocabulary sorts by code points, not UTF-16 code units") {
    // U+FFFD < U+1F600 by code point, but Java's String ordering puts
    // the emoji's lead surrogate (0xD83D) BELOW 0xFFFD — the exact
    // divergence from a UTF-8 engine's ORDER BY the fix closes
    val rep = "�"; val emoji = "😀"
    assert(Ordering.String.compare(emoji, rep) < 0, "premise: Java order differs")
    assert(graft.core.Exact.codePointOrdering.compare(rep, emoji) < 0)
    val m = NegativeSampling.fitModel(
      Seq(s"$emoji $rep apple").toDF("text"), "text", "sU")
    assert(m.words.toSeq === Seq("apple", rep, emoji))
  }

  test("singleton vocabulary always samples the one word") {
    val m = NegativeSampling.fitModel(Seq("only only").toDF("text"), "text", "s1")
    val words = NegativeSampling.sampleTable(spark, m, 50)
      .select("word").distinct().collect().map(_.getString(0)).toSeq
    assert(words === Seq("only"))
  }
}
