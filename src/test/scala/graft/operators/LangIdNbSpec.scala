package graft.operators

import graft.SparkSpec
import graft.core.Exact
import graft.functions.{LangNbExpressions, LangNbModel}
import org.apache.spark.sql.functions._

/** LangIdNb: hashed char-n-gram NB language classifier — fit, the
  * plan-constant scoring kernel, and kernel ≡ declarative-replay
  * equivalence (the DsirLogWeight discipline).
  */
class LangIdNbSpec extends SparkSpec {
  import spark.implicits._

  private def trainDf = Seq(
    ("en", "the and of is to the and with that"),
    ("en", "the of and is to for not the"),
    ("de", "der und die ist das nicht mit der"),
    ("de", "der die und das ist von auch die"),
    ("fr", "le la et est les dans pour le"),
    ("fr", "la le et les est que une la")
  ).toDF("lang", "text")

  test("charNgrams: codepoint windows, short text empty, non-BMP safe") {
    def ngrams(s: String, n: Int): Seq[String] =
      Seq(s).toDF("t").select(LangIdNb.charNgrams(col("t"), n).as("g"))
        .as[Seq[String]].head()
    assert(ngrams("abcd", 3) === Seq("abc", "bcd"))
    assert(ngrams("abc", 3) === Seq("abc"))
    assert(ngrams("ab", 3) === Seq.empty)
    assert(ngrams("", 3) === Seq.empty)
    // 4 supplementary-plane codepoints -> 2 trigrams of 3 CODEPOINTS
    assert(ngrams("😀😁😂😃", 3) === Seq("😀😁😂", "😁😂😃"))
  }

  test("classifies held-out function-word text; short text is und") {
    val m = LangIdNb.fitModel(trainDf, "text", "lang", buckets = 256, n = 3)
    assert(m.langs.toSeq === Seq("de", "en", "fr"))
    val scored = LangIdNb.scoreDocs(
      Seq((1L, "the is of and to"), (2L, "und der das ist"),
          (3L, "les et la dans"), (4L, "ab")).toDF("id", "text"),
      "id", "text", m)
      .orderBy("id").collect()
    assert(scored.map(_.getString(1)).toSeq === Seq("en", "de", "fr", "und"))
    assert(scored(3).isNullAt(2), "und carries a null score")
    assert(!scored(0).isNullAt(2) && scored(0).getDouble(2) < 0.0)
  }

  test("kernel score equals the declarative DataFrame replay") {
    val buckets = 256
    val m = LangIdNb.fitModel(trainDf, "text", "lang", buckets, n = 3)
    val docs = Seq((1L, "the der le and und"), (2L, "xyzzy plugh"),
      (3L, "est-ce que c'est une")).toDF("id", "text")
    // declarative replay: explode ngrams, join fitted counts, 9-dp
    // lambda per occurrence, exact decimal sum + prior, argmax
    val counts = LangIdNb.fitCounts(trainDf, "text", "lang", buckets, 3)
    val tots = counts.groupBy("lang").agg(sum("cnt").as("tot"))
    val dcs = trainDf.groupBy("lang").agg(count(lit(1)).as("dc"))
    val nDocs = trainDf.count()
    val pri = dcs.select(col("lang"),
      round(log(col("dc").cast("double") / lit(nDocs.toDouble)), 9).as("prior"))
    val occ = docs.select(col("id"),
        explode(LangIdNb.charNgrams(col("text"), 3)).as("_ng"))
      .select(col("id"), Dsir.bucketOf(col("_ng"), buckets).as("bucket"))
    val lam = occ.crossJoin(broadcast(tots))
      .join(counts.withColumnRenamed("cnt", "_c"), Seq("lang", "bucket"), "left")
      .withColumn("_lam", round(log(
        (coalesce(col("_c"), lit(0L)) + 1L).cast("double") /
          (col("tot") + buckets).cast("double")), 9))
    val totals = lam.groupBy("id", "lang")
      .agg(Exact.dsum(col("_lam"), scale = 9).as("_s"))
      .join(pri, "lang")
      .select(col("id"), col("lang"),
        (col("_s") + col("prior").cast("decimal(38,9)")).as("total"))
    import org.apache.spark.sql.expressions.Window
    val best = totals.withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("total").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("id"), col("lang"),
        round(col("total").cast("double"), 6).as("score"))
      .orderBy("id").collect()
    val kernel = LangIdNb.scoreDocs(docs, "id", "text", m)
      .orderBy("id").collect()
    assert(best.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      === kernel.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq)
  }

  test("argmax ties break on the lexicographically smallest language") {
    // identical training text for both labels -> identical lambdas
    // and priors -> every doc ties -> 'aa' (lex-min) must win
    val twin = Seq(("zz", "mirror mirror text"), ("aa", "mirror mirror text"))
      .toDF("lang", "text")
    val m = LangIdNb.fitModel(twin, "text", "lang", buckets = 64, n = 3)
    val out = LangIdNb.scoreDocs(
      Seq((1L, "mirror text")).toDF("id", "text"), "id", "text", m).head()
    assert(out.getString(1) === "aa")
  }

  test("fit is partitioning-invariant; scoring is streaming-shaped") {
    val m1 = LangIdNb.fitModel(trainDf.repartition(1), "text", "lang", 128, 3)
    val m7 = LangIdNb.fitModel(trainDf.repartition(7), "text", "lang", 128, 3)
    assert(m1.langs.toSeq === m7.langs.toSeq)
    assert(m1.priorScaled.toSeq === m7.priorScaled.toSeq)
    assert(m1.lamScaled.map(_.toSeq).toSeq === m7.lamScaled.map(_.toSeq).toSeq)
    // scoring plan: no exchange (pure map-side projection)
    val plan = LangIdNb.scoreDocs(
      Seq((1L, "abc")).toDF("id", "text"), "id", "text", m1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
