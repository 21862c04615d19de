package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple apple banana common common"),
    (2L, "banana cherry common common date"),
    (3L, "common common common elder elder")).toDF("doc_id", "text")

  test("tfidfKeywords ranks rare repeated terms above ubiquitous ones") {
    val rows = Retrieval.tfidfKeywords(corpus, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
    // doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5);
    // common df=3 -> idf 0. Top-2 = apple, banana.
    val d1 = rows.filter(_.getLong(0) == 1L).map(_.getString(2)).toSeq
    assert(d1 === Seq("apple", "banana"))
    // doc 3: elder tf=2 df=1 wins; common scores 0
    val d3 = rows.filter(_.getLong(0) == 3L).map(_.getString(2)).toSeq
    assert(d3.head === "elder")
  }

  test("tfidfKeywords score arithmetic is the exact decimal product") {
    val r = Retrieval.tfidfKeywords(corpus, "doc_id", "text", k = 1)
      .filter(col("doc_id") === 1L).head()
    val idf9 = BigDecimal(math.log(3.0 / 1.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expect = (BigDecimal(2) * idf9).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(r.getAs[Double]("score") === expect.toDouble)
    assert(r.getAs[Long]("tf") === 2L && r.getAs[Long]("df") === 1L)
  }

  test("tfidfKeywords ties rank by token; k bounds output per doc") {
    // doc 2: banana/cherry/date all tf=1; banana df=2, cherry/date df=1.
    // cherry and date tie exactly -> token order decides
    val d2 = Retrieval.tfidfKeywords(corpus, "doc_id", "text", k = 3)
      .filter(col("doc_id") === 2L).orderBy("rank")
      .select("token").collect().map(_.getString(0)).toSeq
    assert(d2 === Seq("cherry", "date", "banana"))
    val counts = Retrieval.tfidfKeywords(corpus, "doc_id", "text", k = 2)
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 2))
  }

  test("tfidfKeywords is partitioning-invariant") {
    val a = Retrieval.tfidfKeywords(corpus, "doc_id", "text", k = 3)
      .orderBy("doc_id", "rank").collect().toSeq
    val b = Retrieval.tfidfKeywords(corpus.repartition(7), "doc_id", "text", k = 3)
      .orderBy("doc_id", "rank").collect().toSeq
    assert(a === b)
  }
}
