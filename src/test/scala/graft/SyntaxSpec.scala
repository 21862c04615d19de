package graft

import graft.syntax._
import org.apache.spark.sql.functions._

class SyntaxSpec extends SparkSpec {
  import spark.implicits._

  test("fluent API delegates to the operator objects (same results)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different content right here")).toDF("doc_id", "text")

    val fluent = docs.dedupExactBy("text", col("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val direct = graft.operators.Dedup.exactByHash(docs, "text", Seq(col("doc_id")))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(fluent === direct && fluent === Seq(1L, 3L))

    val ratio = docs.duplicatedWindowRatio("doc_id", "text", 3)
      .select("doc_id", "dup_ratio").as[(Long, Double)].collect().toMap
    assert(ratio(1L) === 1.0 && ratio(3L) === 0.0)

    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
      .triangleCount("a", "b").as[(Long, Long, Long)].head()
    assert(tri === ((3L, 3L, 1L)))

    val bm = docs.bm25TopK("doc_id", "text", Seq("alpha"), k = 5)
    assert(bm.count() === 2)
  }
}
