package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.OpCache.TrackedPersist
import graft.functions.{ShingleExpressions, SpanExpressions, Text}

/** ExactSubstr duplicated-span REMOVAL (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022): where
  * [[Dedup.duplicatedWindowRatio]] *reports* how much of each
  * document is duplicated, this operator performs the actual
  * curation step the report feeds — delete every token covered by a
  * duplicated `windowTokens`-token window and re-emit the cleaned
  * document plus removal statistics.
  *
  * Granularity contract (matches q129 exactly): a window is
  * "duplicated" when its distinct-per-document window string occurs
  * in ≥ 2 documents; a token is removed when ≥ 1 duplicated window
  * covers it. Under-`windowTokens` documents have one whole-document
  * window — a short doc duplicated elsewhere empties entirely.
  * Cleaned text re-joins surviving tokens with single spaces (token-
  * granularity canonical form; Lee et al.'s byte-level variant needs
  * a suffix array the token-window form deliberately avoids).
  *
  * 100 TB shape: windows ride as 8-byte xxhash64 keys (collision
  * argument as in [[Dedup.substringWindowPairs]]) — uniformly
  * distributed, so the df groupBy and the position semi-join shuffle
  * without skew; the df table is corpus-sized, so the semi-join is a
  * SHUFFLE join by design (broadcast would be wrong at scale — AQE
  * still downgrades it to broadcast on small inputs). Per-document
  * duplicated positions aggregate to one bounded array (≤ windows/
  * doc), and the span merge is the O(n + p) [[graft.functions
  * .SpanKernels]] sweep, map-side after one join back to the
  * tokenized corpus. Nothing corpus-sized ever windows or sorts.
  */
object ExactSubstr {

  /** (`idCol`, clean_text, n_tokens, n_removed, n_spans) for EVERY
    * input document (clean docs pass through with zero removal
    * stats; fully duplicated docs come back with clean_text = "").
    */
  def removeDuplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    // tokenized corpus feeds three consumers (df windows, positional
    // windows, final join-back) — materialize once
    val toks = df
      .select(col(idCol).as("_id"), Text.tokens(col(textCol)).as("_toks"))
      .persistTracked

    // distinct-per-doc windows → document frequency (q129 semantics)
    val wins = toks
      .select(col("_id"),
        explode(ShingleExpressions.shingles(col("_toks"), windowTokens)).as("_win"))
      .select(col("_id"), xxhash64(col("_win")).as("_wh"))
    val dup = wins.groupBy("_wh").agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= 2).select("_wh")

    // positional windows: (doc, window start, window hash) — the
    // window expression stays INSIDE the generator input (generator
    // inputs evaluate once per row; the r13 generator-shape rule)
    val posWins = toks.select(col("_id"),
      posexplode(transform(
        sequence(lit(0), greatest(size(col("_toks")) - windowTokens, lit(0))),
        i => xxhash64(concat_ws(" ",
          slice(col("_toks"), i + 1, lit(windowTokens)))))).as(Seq("_pos", "_wh")))

    // duplicated start positions per doc: shuffle semi-join on the
    // uniform 8-byte hash, then one bounded per-doc array
    val dupPos = posWins
      .join(dup, Seq("_wh"), "left_semi")
      .groupBy("_id")
      .agg(sort_array(collect_list(col("_pos"))).as("_dps"))

    toks.join(dupPos, Seq("_id"), "left")
      .select(col("_id"),
        SpanExpressions.removeDupSpans(col("_toks"),
          coalesce(col("_dps"), array().cast("array<int>")), windowTokens).as("_r"))
      .select(col("_id").as(idCol),
        col("_r.clean_text").as("clean_text"),
        col("_r.n_tokens").as("n_tokens"),
        col("_r.n_removed").as("n_removed"),
        col("_r.n_spans").as("n_spans"))
  }

  /** The INGEST-TIME state for [[removeDuplicatedSpansIncremental]]:
    * per-window document frequency, hash-keyed — (wh BIGINT, df
    * BIGINT). 8 + 8 bytes per distinct window; written once when a
    * corpus generation is ingested, merged additively across
    * generations (df is a count — `union → groupBy sum` refreshes
    * it, the [[graft.operators.IncrementalAgg]] shape).
    */
  def windowDfTable(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    df.select(col(idCol).as("_id"),
        explode(ShingleExpressions.shingles(
          Text.tokens(col(textCol)), windowTokens)).as("_win"))
      .select(xxhash64(col("_win")).as("wh"))
      .groupBy("wh").agg(count(lit(1)).as("df"))
  }

  /** Incremental ExactSubstr: clean ONLY the delta against everything
    * seen so far — history text is immutable (published shards don't
    * get rewritten; new data is cleaned against the union). A delta
    * window is duplicated when history-df + delta-df ≥ 2 — EXACTLY
    * the batch rule over history ∪ delta, restricted to delta docs
    * (the q105/q85 incremental ≡ from-scratch contract; the oracle
    * replays the batch form).
    *
    * 100 TB shape: history is touched ONLY through the stored
    * 16-byte/window df index — never re-tokenized, never re-hashed
    * (the q85 band-index discipline); the delta's windows equi-join
    * it on the uniform 8-byte hash (no skew), and everything
    * downstream is delta-sized.
    */
  def removeDuplicatedSpansIncremental(
      historyDf: DataFrame,
      delta: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    val toks = delta
      .select(col(idCol).as("_id"), Text.tokens(col(textCol)).as("_toks"))
      .persistTracked

    val wins = toks
      .select(col("_id"),
        explode(ShingleExpressions.shingles(col("_toks"), windowTokens)).as("_win"))
      .select(col("_id"), xxhash64(col("_win")).as("_wh"))
    val dup = wins.groupBy("_wh").agg(count(lit(1)).as("_ddf"))
      .join(historyDf.select(col("wh").as("_wh"), col("df").as("_hdf")), Seq("_wh"), "left")
      .filter(col("_ddf") + coalesce(col("_hdf"), lit(0L)) >= 2)
      .select("_wh")

    val posWins = toks.select(col("_id"),
      posexplode(transform(
        sequence(lit(0), greatest(size(col("_toks")) - windowTokens, lit(0))),
        i => xxhash64(concat_ws(" ",
          slice(col("_toks"), i + 1, lit(windowTokens)))))).as(Seq("_pos", "_wh")))

    val dupPos = posWins
      .join(dup, Seq("_wh"), "left_semi")
      .groupBy("_id")
      .agg(sort_array(collect_list(col("_pos"))).as("_dps"))

    toks.join(dupPos, Seq("_id"), "left")
      .select(col("_id"),
        SpanExpressions.removeDupSpans(col("_toks"),
          coalesce(col("_dps"), array().cast("array<int>")), windowTokens).as("_r"))
      .select(col("_id").as(idCol),
        col("_r.clean_text").as("clean_text"),
        col("_r.n_tokens").as("n_tokens"),
        col("_r.n_removed").as("n_removed"),
        col("_r.n_spans").as("n_spans"))
  }
}
