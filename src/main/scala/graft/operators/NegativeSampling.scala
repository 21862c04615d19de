package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{NegSampleExpressions, NegSampleKernel, TextExpressions}

/** Unigram^(3/4) negative-sampling table over a corpus — see
  * [[graft.functions.NegSampleKernel]] for the distribution, the
  * deterministic inverse-CDF contract, and the two-sqrt pow
  * discipline. FIT = one vocab-sized aggregation + a model-sized
  * collect; SAMPLE = a per-row O(log V) projection over the draw
  * range.
  */
object NegativeSampling {

  private def r9(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  def fitModel(docs: DataFrame, textCol: String, seed: String): NegSampleKernel.Model = {
    val rows = docs
      .select(explode(TextExpressions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .collect() // vocabulary-sized (Heaps' law), model precedent
      .map(r => (r.getString(0), r.getLong(1)))
      // code-point order, NOT Java's UTF-16 code-unit order — the
      // cumulative CDF's word order must match the oracle's UTF-8
      // ORDER BY for supplementary-plane tokens (Exact.codePointOrdering)
      .sortBy(_._1)(graft.core.Exact.codePointOrdering)
    require(rows.nonEmpty, "empty corpus")
    val words = rows.map(_._1)
    // cnt^(3/4) = sqrt(cnt)·sqrt(sqrt(cnt)) — both sqrts correctly
    // rounded per IEEE-754, unlike libm pow(); 9-dp round
    val w9 = rows.map { case (_, c) =>
      r9(math.sqrt(c.toDouble) * math.sqrt(math.sqrt(c.toDouble)))
    }
    var acc = java.math.BigDecimal.ZERO
    val cums = w9.map { w =>
      acc = acc.add(new java.math.BigDecimal(java.lang.Double.toString(w))
        .setScale(9, java.math.RoundingMode.HALF_UP))
      acc.doubleValue()
    }
    new NegSampleKernel.Model(seed, words, cums, acc.doubleValue())
  }

  /** (draw, word) for draws 1..nDraws under `model`. */
  def sampleTable(spark: SparkSession, model: NegSampleKernel.Model,
      nDraws: Int): DataFrame = {
    require(nDraws >= 1, s"nDraws must be >= 1, got $nDraws")
    spark.range(1, nDraws + 1L).select(col("id").as("draw"),
      NegSampleExpressions.negSample(col("id"), model).as("word"))
  }
}
