package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Text

/** Corpus-level statistical profiling: the descriptive statistics a
  * curation team reads before (and after) a filtering campaign —
  * does the token distribution look like natural language (Zipf's
  * law), which documents are degenerate keyword stuffing (unigram
  * entropy), and which word pairs are genuine collocations rather
  * than chance co-occurrence (pointwise mutual information, Church &
  * Hanks, "Word Association Norms, Mutual Information, and
  * Lexicography", Computational Linguistics 1990).
  *
  * Determinism discipline (the q114 LanguageModel pattern): every
  * count is an exact integer; every `ln` is rounded to 9 dp before
  * entering an aggregation; sums of 9-dp values run in DECIMAL
  * (order-independent at any parallelism); only the final scalar
  * divisions are floating point, each a fixed IEEE expression tree
  * mirrored verbatim by the DuckDB oracle.
  *
  * 100 TB shape: all three statistics reduce the corpus with
  * map-side-combinable `groupBy` counts (shuffle ∝ distinct tokens /
  * bigrams / (doc, token) pairs, never raw corpus bytes); the OLS
  * fit and the top-k selections run on model-sized frames
  * (TakeOrdered, no global sort).
  */
object CorpusStats {

  private val D189 = DecimalType(18, 9)

  /** 9-dp-rounded natural log of a positive integral column — the
    * engine-portable transcendental quantum (both engines' libm `ln`
    * agree far inside 1e-9 for these arguments; rounding pins the
    * shared value).
    */
  private def ln9(c: Column): Column = bround(log(c.cast("double")), 9)

  /** Zipf's-law fit of the token frequency distribution: ordinary
    * least squares of ln(freq) on ln(rank) over the `topK` most
    * frequent tokens (the standard head-fit — the tail's
    * count-quantization bends the line). Natural-language corpora
    * fit slope ≈ −1 (Zipf 1949); a corpus of boilerplate or
    * machine-generated spam does not — this one row is the cheapest
    * corpus-health smoke test there is.
    *
    * Exactness: ranks and counts are exact; ln values are 9-dp; all
    * five OLS sums are DECIMAL-exact; the closed-form slope
    * numerator/denominator are computed IN DECIMAL (casts sized so
    * every product is representable exactly: (24,18)×(7,0)→(32,18),
    * (18,9)×(18,9)→(37,18)) and only the final slope / intercept /
    * R² divisions are floating point.
    *
    * 100 TB shape: token counting is one map-side-combinable
    * groupBy; the top-k head is TakeOrdered (per-partition k, k-row
    * driver merge — never a global sort); the rank window and the
    * OLS aggregate run on the k-row frame.
    *
    * Output (one row): n_fit, slope, intercept, r2 (6-dp doubles).
    */
  def zipfFit(tokens: DataFrame, tokenCol: String, topK: Int): DataFrame = {
    require(topK >= 3, s"topK must be >= 3 for a meaningful fit, got $topK")
    val counts = tokens.groupBy(col(tokenCol).as("_tok"))
      .agg(count(lit(1)).as("_cnt"))
    val top = counts.orderBy(col("_cnt").desc, col("_tok")).limit(topK)
    val ranked = top.select(col("_cnt"),
      row_number().over(Window.orderBy(col("_cnt").desc, col("_tok"))).as("_rank"))
    olsOverXy(ranked.select(
      ln9(col("_rank")).cast(D189).as("_x"),
      ln9(col("_cnt")).cast(D189).as("_y")))
  }

  /** Decimal-exact OLS over a (_x, _y) frame of DECIMAL(18,9) points
    * — the zipfFit arithmetic, shared by the Heaps fit. Output:
    * (n_fit, slope, intercept, r2), ratios in IEEE rounded 6 dp.
    */
  private def olsOverXy(xy: DataFrame): DataFrame = {
    val agg = xy.agg(
      count(lit(1)).as("n_fit"),
      sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
      sum(col("_x") * col("_y")).as("_sxy"),
      sum(col("_x") * col("_x")).as("_sxx"),
      sum(col("_y") * col("_y")).as("_syy"))
    val n7 = col("n_fit").cast(DecimalType(7, 0))
    def d2418(c: Column) = c.cast(DecimalType(24, 18))
    def d189(c: Column) = c.cast(D189)
    val num = (d2418(col("_sxy")) * n7) - (d189(col("_sx")) * d189(col("_sy")))
    val denx = (d2418(col("_sxx")) * n7) - (d189(col("_sx")) * d189(col("_sx")))
    val deny = (d2418(col("_syy")) * n7) - (d189(col("_sy")) * d189(col("_sy")))
    val numD = num.cast("double")
    val denxD = denx.cast("double")
    val denyD = deny.cast("double")
    // degenerate-variance guards: a saturated vocabulary (all y
    // equal — the finite-pool corpus regime Heaps' fit can hit) or
    // all-equal x makes a denominator exactly 0; ANSI div would
    // throw, and r2 is genuinely undefined there → NULL
    val slopeRaw = when(denxD =!= 0.0, numD / denxD)
    agg.select(
      col("n_fit"),
      round(slopeRaw, 6).as("slope"),
      round((col("_sy").cast("double") - slopeRaw * col("_sx").cast("double"))
        / col("n_fit").cast("double"), 6).as("intercept"),
      when(denxD * denyD =!= 0.0,
        round((numD * numD) / (denxD * denyD), 6)).as("r2"))
  }

  /** Heaps'-law exponent fit (Heaps 1978; the V(n) = K·n^β vocabulary
    * growth curve — q139 zipfFit's natural partner: β near 1 means
    * the vocabulary is still exploding and dedup/tokenizer decisions
    * made today will not transfer to 10× the data). The growth curve
    * is reconstructed WITHOUT any corpus-ordered window via the
    * FIRST-OCCURRENCE trick: each word's earliest doc id is a
    * vocab-sized aggregate, and V(t) at a checkpoint t is just a
    * count of first-occurrences ≤ t — so 10 checkpoints cost one
    * broadcast of 10 slim thresholds against two partial-agg counts.
    * Checkpoints are tᵢ = ⌊i·(maxId+1)/k⌋ over the id range; the OLS
    * over (ln n(t), ln V(t)) reuses the exact-decimal zipfFit
    * machinery. Output: (n_fit, slope = β, intercept = ln K, r2).
    *
    * Id-range caveat: checkpoints are positions in the ID RANGE, not
    * row ranks — a sparse id space can leave a checkpoint interval
    * with zero docs, and such checkpoints drop out of the fit (the
    * inner join has no (n, V) point for them), so `n_fit` may come
    * back below `checkpoints`. That is the honest behavior (no
    * fabricated points), but dense ids give the best-conditioned fit.
    */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String,
      checkpoints: Int = 10): DataFrame = {
    require(checkpoints >= 3, s"need >= 3 checkpoints, got $checkpoints")
    val spark = docs.sparkSession
    import spark.implicits._
    // cast-to-long is type-tolerant (int/short ids work); the null
    // check fails loudly on an empty corpus instead of NPE-ing
    val maxRow = docs.agg(max(col(idCol).cast("long")).as("_m")).head()
    require(!maxRow.isNullAt(0),
      s"heapsFit: empty corpus (no rows, or all-null $idCol)")
    val maxId = maxRow.getLong(0)
    val ts = (1 to checkpoints)
      .map(i => i.toLong * (maxId + 1L) / checkpoints).distinct.toDF("_thr")
    val firstDoc = docs
      .select(col(idCol).as("_d"),
        explode(graft.functions.Text.tokens(col(textCol))).as("_w"))
      .groupBy("_w").agg(min(col("_d")).as("_fd"))
    val vAt = firstDoc.crossJoin(broadcast(ts))
      .filter(col("_fd") <= col("_thr"))
      .groupBy("_thr").agg(count(lit(1)).as("_v"))
    val nAt = docs.select(col(idCol).as("_d"))
      .crossJoin(broadcast(ts))
      .filter(col("_d") <= col("_thr"))
      .groupBy("_thr").agg(count(lit(1)).as("_n"))
    olsOverXy(nAt.join(vAt, "_thr")
      .select(ln9(col("_n")).cast(D189).as("_x"),
        ln9(col("_v")).cast(D189).as("_y")))
  }

  /** Per-document unigram (token) Shannon entropy in nats:
    * H = ln n − (Σ c·ln c)/n over the doc's token counts — the
    * keyword-stuffing / template-spam detector (a 500-token page
    * that is "buy cheap buy cheap …" has H ≈ ln 2 regardless of
    * length; natural prose of that length sits above 4). Documents
    * with zero tokens are absent from the output (no evidence).
    *
    * Exactness: c and n are exact; ln c is 9-dp; the c·ln c product
    * is a DECIMAL(18,9)×DECIMAL(12,0) → (31,9) exact product summed
    * in DECIMAL (NEVER a double product — c·ln c can need 17
    * significant digits, and a double→DECIMAL quantization of the
    * product would tie-split between engines); one final division.
    *
    * 100 TB shape: two map-side-combinable groupBys — shuffle ∝
    * distinct (doc, token) pairs then ∝ docs; no windows, no
    * collects.
    *
    * Output: (idCol, n_tokens, n_distinct, entropy 6-dp).
    */
  /** Distribution entropy of `valueCol` WITHIN each `groupCol` group
    * — [[tokenEntropy]]'s arithmetic (H = ln n − (Σ c·ln c)/n nats,
    * DECIMAL-exact products) at arbitrary granularity: per-source
    * language diversity (q154), per-shard label balance, etc. Two
    * map-side-combinable groupBys; the second runs on the
    * (group × value)-sized count table.
    * Output: (`groupCol`, n BIGINT, n_distinct BIGINT, entropy 6 dp).
    */
  def groupEntropy(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val tc = df.groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("_c"))
    tc.groupBy(col(groupCol))
      .agg(
        sum(col("_c")).as("n"),
        count(lit(1)).as("n_distinct"),
        sum(ln9(col("_c")).cast(D189) * col("_c").cast(DecimalType(12, 0)))
          .as("_sc"))
      .select(col(groupCol), col("n"), col("n_distinct"),
        round(ln9(col("n"))
          - col("_sc").cast("double") / col("n").cast("double"), 6)
          .as("entropy"))
  }

  /** Good–Turing unseen-species mass per group (Good, Biometrika
    * 1953): p₀ ≈ n₁/N — the probability the NEXT token drawn from
    * this language is a word never seen in the corpus, estimated
    * from the hapax count. The corpus-coverage / OOV-rate report a
    * pipeline reads before deciding whether a language has enough
    * data to train a tokenizer on (a high p₀ vocabulary is still
    * growing — Heaps' regime). Output per group: token count N,
    * vocabulary V, hapax n₁, dis-legomena n₂, p_unseen = n₁/N.
    *
    * 100 TB shape: the token stream collapses to (group, word)
    * counts with map-side partial agg (vocab-sized), then a
    * group-count-sized rollup — the frequency-of-frequencies
    * discipline of [[SkewReport]]: nothing corpus-sized is sorted or
    * windowed.
    */
  def goodTuring(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val wc = docs
      .select(col(groupCol), explode(graft.functions.Text.tokens(col(textCol))).as("_w"))
      .groupBy(col(groupCol), col("_w")).agg(count(lit(1)).as("_c"))
    wc.groupBy(col(groupCol)).agg(
        sum(col("_c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("_c") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(when(col("_c") === 2, 1L).otherwise(0L)).as("dis"))
      .select(col(groupCol), col("n_tokens"), col("vocab"), col("hapax"),
        col("dis"),
        round(col("hapax").cast("double") / col("n_tokens").cast("double"), 6)
          .as("p_unseen"))
  }

  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tc = docs
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("_t"))
      .groupBy(col(idCol), col("_t")).agg(count(lit(1)).as("_c"))
    tc.groupBy(col(idCol))
      .agg(
        sum(col("_c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(ln9(col("_c")).cast(D189) * col("_c").cast(DecimalType(12, 0)))
          .as("_sc"))
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        round(ln9(col("n_tokens"))
          - col("_sc").cast("double") / col("n_tokens").cast("double"), 6)
          .as("entropy"))
  }

  /** Collocation mining by pointwise mutual information:
    * PMI(w1,w2) = ln( c(w1,w2)·T / (c(w1)·c(w2)) ) over adjacent
    * token pairs with c(w1,w2) ≥ `minCount` (the Church–Hanks
    * association measure; the min-count floor is the standard guard
    * against PMI's low-frequency bias). Returns the `topK` pairs by
    * (pmi desc, w1, w2) — the corpus's phrasebook ("los angeles",
    * "machine learning"), and a drift probe when diffed across
    * snapshots.
    *
    * Exactness: all counts exact; the PMI argument is a division of
    * two exact long products (both far inside 2^53 here — at corpus
    * sizes where c·T approaches 2^63, lift the products to
    * DECIMAL(19,0) as [[zipfFit]] does; ANSI mode makes the overflow
    * loud, not silent); ln is 9-dp; ordering ties break on the pair
    * itself.
    *
    * 100 TB shape: bigram and unigram counting are map-side-
    * combinable groupBys (shuffle ∝ distinct n-grams); the count
    * joins hit model-sized frames (the unigram table broadcasts);
    * top-k is TakeOrdered.
    *
    * Output: (w1, w2, cnt, pmi 9-dp), topK rows.
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Long, topK: Int): DataFrame = {
    val t = Text.tokens(col(textCol))
    val n1 = greatest(size(t) - 1, lit(0))
    val bi = docs.select(explode(zip_with(
        slice(t, lit(1), n1), slice(t, lit(2), n1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("_p"))
      .select(col("_p.w1").as("w1"), col("_p.w2").as("w2"))
    val bc = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val uniS = docs.select(explode(t).as("_w"))
    val uc = uniS.groupBy("_w").agg(count(lit(1)).as("_c"))
    val tot = uniS.agg(count(lit(1)).as("_t"))
    // vocab-table joins: left to AQE — a unigram table is usually
    // broadcastable but CAN reach GBs at web scale; forcing the hint
    // would pin a hazard
    bc
      .join(uc.select(col("_w").as("w1"), col("_c").as("_c1")), Seq("w1"))
      .join(uc.select(col("_w").as("w2"), col("_c").as("_c2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("cnt"),
        bround(log((col("cnt") * col("_t")).cast("double")
          / (col("_c1") * col("_c2")).cast("double")), 9).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(topK)
  }
}
