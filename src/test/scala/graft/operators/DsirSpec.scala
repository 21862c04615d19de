package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 256

  // two disjoint vocabularies: "curated" prose vs "boilerplate" spam
  private def doc(words: Seq[String], rnd: scala.util.Random, n: Int): String =
    Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")

  private val curated = Seq("theory", "proof", "lemma", "axiom", "topology", "measure")
  private val spam = Seq("click", "buy", "now", "free", "winner", "offer")

  private def corpus(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val target = Seq.tabulate(30)(i => (i.toLong, "target", doc(curated, rnd, 20)))
    // raw pool: ids 100+ curated-like, ids 200+ spam-like
    val rawGood = Seq.tabulate(25)(i => (100L + i, "raw", doc(curated, rnd, 20)))
    val rawSpam = Seq.tabulate(25)(i => (200L + i, "raw", doc(spam, rnd, 20)))
    (target.toDF("doc_id", "kind", "text"),
      (rawGood ++ rawSpam).toDF("doc_id", "kind", "text"))
  }

  test("importance weights separate target-like from off-distribution docs") {
    val (target, raw) = corpus(7)
    val tc = Dsir.fitBucketCounts(target, "text", B)
    val rc = Dsir.fitBucketCounts(raw, "text", B)
    val w = Dsir.importanceWeights(raw, "doc_id", "text", tc, rc, B)
      .select("doc_id", "logw").as[(Long, Double)].collect().toMap
    val good = w.filter(_._1 < 200).values
    val bad = w.filter(_._1 >= 200).values
    // every curated-like raw doc outscores every spam doc
    assert(good.min > bad.max,
      s"expected separation, got good.min=${good.min} bad.max=${bad.max}")
  }

  test("weights and resample are partitioning-invariant (bit-identical)") {
    val (target, raw) = corpus(11)
    def run(parts: Int): Seq[(Long, Long)] = {
      val t = target.repartition(parts)
      val r = raw.repartition(parts)
      val tc = Dsir.fitBucketCounts(t, "text", B)
      val rc = Dsir.fitBucketCounts(r, "text", B)
      val u = (conv(substring(md5(col("text")), 1, 12), 16, 10).cast("double") + 0.5) /
        lit(281474976710656.0)
      val w = Dsir.importanceWeights(r, "doc_id", "text", tc, rc, B)
        .join(r.select(col("doc_id"), u.as("_u")), "doc_id")
      Dsir.resample(w, "doc_id", "logw", col("_u"), 10)
        .as[(Long, Long)].collect().sorted.toSeq
    }
    assert(run(1) === run(7))
  }

  test("resample without replacement: k distinct ids, ascending (key, id), favors high logw") {
    val (target, raw) = corpus(13)
    val tc = Dsir.fitBucketCounts(target, "text", B)
    val rc = Dsir.fitBucketCounts(raw, "text", B)
    val u = (conv(substring(md5(col("text")), 1, 12), 16, 10).cast("double") + 0.5) /
      lit(281474976710656.0)
    val w = Dsir.importanceWeights(raw, "doc_id", "text", tc, rc, B)
      .join(raw.select(col("doc_id"), u.as("_u")), "doc_id")
    val sel = Dsir.resample(w, "doc_id", "logw", col("_u"), 20)
      .as[(Long, Long)].collect()
    assert(sel.map(_._1).distinct.length === 20)
    // the Gumbel noise is O(1); the vocab split pushes logw gaps far
    // beyond it, so the 20 picks from a 25/25 pool are all curated-like
    val curatedPicks = sel.count(_._1 < 200)
    assert(curatedPicks === 20, s"expected all picks curated-like, got $curatedPicks/20")
  }

  test("plan-constant kernel ≡ batch operator (bit-identical logw) on random corpora") {
    val (target, raw) = corpus(29)
    val tc = Dsir.fitBucketCounts(target, "text", B)
    val rc = Dsir.fitBucketCounts(raw, "text", B)
    val batch = Dsir.importanceWeights(raw, "doc_id", "text", tc, rc, B)
      .select("doc_id", "n_ngrams", "logw")
      .as[(Long, Long, Double)].collect().sorted.toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val lm = graft.functions.DsirLm(rows(tc), rows(rc), B)
    val kernel = raw.select(col("doc_id"),
        graft.functions.DsirExpressions.dsirLogWeight(
          graft.functions.Text.tokens(col("text")), lm).as("_s"))
      .filter(col("_s").isNotNull)
      .select(col("doc_id"), col("_s.n_ngrams"), col("_s.logw"))
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(kernel === batch)
  }

  test("kernel fitBucketCounts ≡ two-scan HOF formulation (counts per bucket)") {
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, ""), (3L, "one"),
      (4L, "a  b   a b"), (5L, "é ü 汉字 é ü"),
      (6L, (1 to 40).map(i => s"w${i % 7}").mkString(" ")))
      .toDF("doc_id", "text").repartition(3)
    for (b <- Seq(7, 1024)) {
      val k = Dsir.fitBucketCounts(docs, "text", b)
        .orderBy("bucket").collect().map(_.toSeq).toSeq
      val h = Dsir.fitBucketCountsHof(docs, "text", b)
        .orderBy("bucket").collect().map(_.toSeq).toSeq
      assert(k === h, s"buckets=$b")
    }
  }

  test("n_ngrams = 2*tokens - 1; token-less docs are absent") {
    val docs = Seq((1L, "a b c"), (2L, "solo"), (3L, "   ")).toDF("doc_id", "text")
    val m = Dsir.fitBucketCounts(docs, "text", B)
    val w = Dsir.importanceWeights(docs, "doc_id", "text", m, m, B)
      .select("doc_id", "n_ngrams").as[(Long, Long)].collect().toMap
    assert(w === Map(1L -> 5L, 2L -> 1L)) // 3 uni + 2 bi; 1 uni; absent
  }
}
