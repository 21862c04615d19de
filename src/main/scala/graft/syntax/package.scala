package graft

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators._

/** Fluent DataFrame syntax for the graft operator library — the
  * import a pipeline author writes once:
  *
  * {{{
  * import graft.syntax._
  *
  * corpus
  *   .nearDupPairs("doc_id", "text", threshold = 0.8)    // LSH banding
  * corpus
  *   .dedupExactBy("text", col("doc_id"))                // content hash
  * corpus
  *   .duplicatedWindowRatio("doc_id", "text", 50)        // Lee et al. diagnostic
  * }}}
  *
  * Every method delegates to the corresponding operator object (the
  * single source of truth for semantics, scale shape, and tests) —
  * this package adds NO behavior, only discoverability: an IDE lists
  * the whole curation surface after one dot.
  */
package object syntax {

  implicit class GraftCorpusOps(private val df: DataFrame) extends AnyVal {

    // ---- dedup family ----
    def dedupExactBy(textCol: String, keep: Column*): DataFrame =
      Dedup.exactByHash(df, textCol, keep)
    def nearDupPairs(idCol: String, textCol: String, threshold: Double): DataFrame =
      NearDup.nearDupPairs(df, idCol, textCol, threshold)
    def duplicatedWindowRatio(idCol: String, textCol: String, windowTokens: Int): DataFrame =
      Dedup.duplicatedWindowRatio(df, idCol, textCol, windowTokens)
    def substringWindowPairs(idCol: String, textCol: String,
        windowTokens: Int, maxDf: Int): DataFrame =
      Dedup.substringWindowPairs(df, idCol, textCol, windowTokens, maxDf)
    def contaminationAgainst(idCol: String, textCol: String,
        benchmark: DataFrame, benchTextCol: String, windowTokens: Int): DataFrame =
      Dedup.contamination(df, idCol, textCol, benchmark, benchTextCol, windowTokens)
    def connectedComponents(idCol: String, pairs: DataFrame,
        aCol: String, bCol: String): DataFrame =
      Dedup.componentsStar(df, idCol, pairs, aCol, bCol)

    // ---- retrieval / ranking ----
    def bm25TopK(idCol: String, textCol: String,
        terms: Seq[String], k: Int): DataFrame =
      Retrieval.bm25TopK(df, idCol, textCol, terms, k)
    def bm25TopKBatch(idCol: String, textCol: String,
        queries: Seq[(Long, Seq[String])], k: Int): DataFrame =
      Retrieval.bm25TopKBatch(df, idCol, textCol, queries, k)

    // ---- selection / sampling ----
    def dsirBucketCounts(textCol: String, buckets: Int): DataFrame =
      Dsir.fitBucketCounts(df, textCol, buckets)
    def klDriftAgainst(previous: DataFrame, textCol: String, k: Int): DataFrame =
      Drift.klDrift(df, previous, textCol, k)

    // ---- chunking / packing ----
    def chunked(idCol: String, textCol: String, window: Int, stride: Int): DataFrame =
      Chunker.chunk(df, idCol, textCol, window, stride)
    def chunkedContentDefined(idCol: String, textCol: String, divisor: Int): DataFrame =
      Chunker.chunkContentDefined(df, idCol, textCol, divisor)

    // ---- graph ----
    def triangleCount(aCol: String, bCol: String): DataFrame =
      Triangles.triangleCount(df, aCol, bCol)
    def pageRank(srcCol: String, dstCol: String, iterations: Int): DataFrame =
      PageRank.pageRank(df, srcCol, dstCol, iterations)
  }
}
