package graft.operators

import graft.functions.{Text, TextExpressions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the ranking function
  * behind Lucene/Elasticsearch defaults (Robertson et al., Okapi at
  * TREC-3; the idf variant is Lucene's `log(1 + (N - df + 0.5) /
  * (df + 0.5))`, which stays positive for df > N/2).
  *
  * A training-data pipeline uses this for corpus curation queries
  * ("pull the top-k documents about X") and contamination forensics
  * ("which documents score highest against this benchmark prompt?").
  *
  * 100 TB shape — the plan is deliberately inverted-index-free:
  *
  *  1. ONE map-side pass projects per-doc state: the token array, its
  *     length `dl`, and per-query-term term frequencies (array HOFs
  *     over the tokens — no explode, no per-term shuffle).
  *  2. ONE tiny mergeable aggregate (count / sum / per-term
  *     contains-counts — all algebraic, map-side combined) produces the
  *     corpus stats `N, total_len, df_t` as a SINGLE ROW, broadcast
  *     back. Cost is independent of vocabulary size: stats exist only
  *     for the handful of query terms, never for the corpus vocabulary
  *     (a vocabulary groupBy at 100 TB is the classic mistake this
  *     avoids — same argument as the Misra-Gries q70 design).
  *  3. Scoring is a pure projection (idf and avgdl come from the
  *     broadcast row), then a global top-k via TakeOrdered — per
  *     partition top-k then a k-row merge on the driver, never a
  *     global sort.
  *
  * Determinism/oracle parity: every reduction is over integers (token
  * counts, doc counts) so partial-merge order cannot change a bit; the
  * floating-point score is computed in ONE fixed expression-tree order
  * from those integers and rounded at 6dp before ranking; ties at the
  * rounded score break on the doc id.
  */
object Retrieval {

  /** Top-k BM25 retrieval of `terms` over `docs(idCol, textCol)`.
    *
    * Score(d) = Σ_t idf(t) · (tf · (k1+1)) / (tf + k1·(1−b + b·dl/avgdl))
    * summed in the fixed order of `terms`; docs matching no term are
    * dropped. Output: (idCol, dl, score) ranked by (score desc, id).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    // per-doc state in ONE token pass: the tf VECTOR (term i →
    // occurrences) comes from the native single-scan kernel
    // (TermTfCounts: O(dl + T) per doc), not T separate
    // size(filter(...)) HOFs (O(dl · T) — each term re-walks the
    // whole token array), so cost stays flat as the query grows from
    // 3 to 100 terms
    val toks = docs.select(col(idCol), Text.tokens(col(textCol)).as("_toks"))
      .withColumn("_dl", size(col("_toks")).cast("long"))
      .withColumn("_tfs", TextExpressions.termTfs(col("_toks"), terms))

    // single-row corpus stats: mergeable integer aggregates only
    val statAggs: Seq[Column] =
      Seq(count(lit(1)).as("_n"), sum(col("_dl")).as("_len")) ++
        terms.indices.map { i =>
          sum(when(element_at(col("_tfs"), i + 1) > lit(0L), 1L)
            .otherwise(0L)).as(s"_df$i")
        }
    val stats = toks.agg(statAggs.head, statAggs.tail: _*)

    val scored = toks.crossJoin(broadcast(stats))
    val dlD = col("_dl").cast("double")
    val nD = col("_n").cast("double")
    val avgdl = col("_len").cast("double") / nD
    // per-term score, summed in fixed `terms` order (left-assoc, same
    // tree as the oracle SQL's `t0 + t1 + ...`)
    val score: Column = terms.indices.map { i =>
      val tf = element_at(col("_tfs"), i + 1).cast("double")
      val dfD = col(s"_df$i").cast("double")
      val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
      when(tf > lit(0.0),
        (idf * (tf * (lit(k1) + lit(1.0)))) /
          (tf + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (dlD / avgdl))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)

    scored
      .withColumn("score", round(score, 6))
      .filter(col("score") > lit(0.0))
      .select(col(idCol), col("_dl").as("dl"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
