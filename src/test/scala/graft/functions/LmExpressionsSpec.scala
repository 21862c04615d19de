package graft.functions

import scala.util.Random

import graft.SparkSpec
import graft.operators.LanguageModel
import org.apache.spark.sql.functions._

class LmExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def trainLm(train: Seq[String]): BigramLm = {
    val (bg, vocab) = LanguageModel.trainBigram(train.toDF("text"), "text")
    BigramLm(bg.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))),
      vocab.head().getLong(0))
  }

  test("property: kernel ≡ batch operator bit-for-bit on random corpora") {
    val rnd = new Random(23)
    val vocabulary = Vector("the", "cat", "sat", "on", "mat", "dog", "ran", "zz")
    for (trial <- 1 to 3) {
      val train = Seq.fill(30)(
        Seq.fill(2 + rnd.nextInt(9))(vocabulary(rnd.nextInt(8))).mkString(" "))
      val score = (0L until 20L).map(i =>
        (i, Seq.fill(rnd.nextInt(9))(vocabulary(rnd.nextInt(8))).mkString(" ")))
      val lm = trainLm(train)
      val viaKernel = score.toDF("doc_id", "text")
        .select($"doc_id",
          LmExpressions.bigramPpl(Text.tokens($"text"), lm).as("_s"))
        .filter($"_s".isNotNull)
        .select($"doc_id", $"_s.n_bigrams", $"_s.ppl")
        .as[(Long, Long, Double)].collect().map { case (k, n, p) => k -> (n, p) }.toMap
      val (bgDf, vocabDf) = LanguageModel.trainBigram(train.toDF("text"), "text")
      val viaBatch = LanguageModel.perplexity(
          score.toDF("doc_id", "text"), "doc_id", "text", bgDf, vocabDf)
        .as[(Long, Long, Double)].collect().map { case (k, n, p) => k -> (n, p) }.toMap
      assert(viaKernel === viaBatch, s"trial $trial kernel diverged from batch plan")
    }
  }

  test("sub-2-token docs score null; model is a plan constant") {
    val lm = trainLm(Seq("a b a b"))
    val out = Seq((1L, "a"), (2L, ""), (3L, "a b a")).toDF("doc_id", "text")
      .select($"doc_id", LmExpressions.bigramPpl(Text.tokens($"text"), lm).as("_s"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out === Map(1L -> true, 2L -> true, 3L -> false))
    assert(lm.size === 2, "a->b and b->a")
  }
}
