package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.OpCache.TrackedPersist
import graft.functions.Text

/** Gopher-style WITHIN-DOCUMENT repetition filters (Rae et al.,
  * "Scaling Language Models: ... Gopher", 2021, Table A1) — the
  * canonical "remove documents that are mostly their own repetition"
  * rules, complementing q53's duplicate-2-gram/top-token ratios with
  * the LINE-level and CHARACTER-COVERAGE signals:
  *
  *  - `dup_line_frac`      — fraction of lines that are EXCESS copies
  *                           of another line in the same doc: counts
  *                           occurrences beyond the first, i.e.
  *                           (n_lines − distinct_lines)/n_lines — a
  *                           doc of one line repeated 4× scores 0.75;
  *  - `dup_line_char_frac` — fraction of line characters living in
  *                           repeated lines, where ALL occurrences of
  *                           a repeated line count (the same 4×-doc
  *                           scores 1.0). The two metrics deliberately
  *                           use DIFFERENT duplicate conventions —
  *                           excess-copies for the line count,
  *                           whole-group for char coverage — matching
  *                           the common Gopher reproductions (e.g.
  *                           Dolma's gopher filters); calibrate
  *                           thresholds per metric, not jointly;
  *  - `top_2gram_char_frac`— fraction of the doc's characters covered
  *                           by occurrences of its most frequent word
  *                           2-gram (ties → lexicographically first);
  *  - `dup_5gram_char_frac`— fraction of TOKEN characters covered by
  *                           any duplicated 5-token window,
  *                           overlapping occurrences counted ONCE
  *                           (true char coverage — an interval union
  *                           per doc, the ExactSubstr discipline, not
  *                           a per-occurrence sum that can exceed 1).
  *
  * `pass` applies Gopher's thresholds (0.30 / 0.20 / 0.20 / 0.15).
  *
  * 100 TB shape ([[report]], the batch/shuffle form): the line
  * metrics explode (doc, line) rows into a within-doc line-group
  * partial aggregate — O(L) per doc riding the doc-keyed exchange
  * the n-gram metrics already pay (the rowwise form keeps the
  * per-row-HOF O(L²) as the price of ZERO exchanges; cap it with
  * [[reportCapped]] on hostile corpora); the n-gram metrics shuffle
  * (doc, gram) rows with map-side partials and windows partitioned
  * BY DOC — never corpus-sized keys. Every ratio is one IEEE
  * division of exact integers rounded 6 dp, so the oracle replays
  * bit-for-bit.
  */
object Repetition {

  val MaxDupLineFrac = 0.30
  val MaxDupLineCharFrac = 0.20
  val MaxTop2GramCharFrac = 0.20
  val MaxDup5GramCharFrac = 0.15

  import graft.functions.GopherExpressions

  /** Kernel-backed projection shared by the public entry points: one
    * [[graft.functions.GopherKernels]] evaluation per row (O(G) hash
    * work — tokens interned once, each n-gram id built from the
    * (n−1)-gram id plus one token id), zero exchanges, whole-stage
    * codegen. This replaced BOTH prior physical forms as the default:
    * the interpreted-HOF row-wise form was O(G²) per row per family
    * (measured q222 15.9 s → 1.4 s at sf0.1, q217 11.7 s → 0.6 s),
    * and the explode/shuffle batch form existed only to avoid that
    * quadratic blowup — with a linear per-row kernel the trade
    * disappears at every scale, 100 TB included (zero exchanges beats
    * two doc-keyed exchanges, and a pathological 50k-token doc costs
    * ~500k hash probes, not 2.5×10⁹ comparisons). Both old forms are
    * kept below as executable specs; RepetitionSpec locks all three
    * bit-identical (same counts, same UTF8-byte-order lex-min top
    * gram, same interval-union coverage, same 6-dp HALF_UP rounds).
    */
  private def kernelProject(docs: DataFrame, idCol: String, m: Column,
      fields: Seq[String]): DataFrame =
    docs.select(col(idCol), m.as("_m"))
      .select(col(idCol) +: fields.map(f => col(s"_m.$f").as(f)): _*)

  private val basicFields = Seq("n_lines", "dup_line_frac",
    "dup_line_char_frac", "top_2gram_char_frac", "dup_5gram_char_frac",
    "pass")

  private def grams(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - (n - 1)),
        i => concat_ws(" ", slice(tk, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  private def r6(c: Column): Column = round(c, 6)

  /** The four q198 metrics — kernel projection (see [[kernelProject]]). */
  def report(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    kernelProject(docs, idCol, GopherExpressions.basic(col(textCol)), basicFields)

  /** The PRIOR batch/shuffle form, kept as an executable spec of the
    * explode → within-doc-group shapes (RepetitionSpec locks it
    * bit-identical to [[report]]); superseded as the default by the
    * O(G)-per-row kernel, which needs no exchange at all.
    */
  def reportShuffle(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol),
        col(textCol).as("_txt"),
        split(col(textCol), "\n").as("_ln"),
        Text.tokens(translate(col(textCol), "\n", " ")).as("_tk"))
      .persistTracked

    // ---- line metrics: explode → within-doc line groups, O(L)/doc --
    // (was a filter-inside-aggregate HOF — O(L²) in the doc's own line
    // count, 4×10⁸ comparisons in one task at 20k lines). The
    // (doc, line) aggregate combines map-side; every doc has ≥ 1 line
    // (split of non-null text yields ≥ 1 element) so no doc drops out.
    val lineChars = (col("_c") * length(col("_l")).cast("long"))
    val lines = base.select(col(idCol), explode(col("_ln")).as("_l"))
      .groupBy(col(idCol), col("_l"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(idCol)
      .agg(sum(col("_c")).as("_nl"),
        count(lit(1)).as("_dl"),
        sum(lineChars).as("_lc"),
        sum(when(col("_c") >= 2, lineChars).otherwise(0L)).as("_dc"))
      .select(col(idCol),
        col("_nl").as("n_lines"),
        r6((col("_nl") - col("_dl")).cast("double") /
          col("_nl").cast("double")).as("dup_line_frac"),
        when(col("_lc") > 0,
          r6(col("_dc").cast("double") / col("_lc").cast("double")))
          .otherwise(0.0).as("dup_line_char_frac"))

    // ---- top-2-gram char coverage: cnt × len(gram) / len(text) ------
    val byDoc = Window.partitionBy(idCol)
    val top2 = base.select(col(idCol), length(col("_txt")).as("_tc"),
        explode(grams(col("_tk"), 2)).as("_g"))
      .groupBy(col(idCol), col("_tc"), col("_g"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_rn", row_number().over(
        byDoc.orderBy(col("_c").desc, col("_g"))))
      .filter(col("_rn") === 1)
      .select(col(idCol),
        r6((col("_c") * length(col("_g"))).cast("double") /
          col("_tc").cast("double")).as("top_2gram_char_frac"))

    // ---- duplicated-5-gram char COVERAGE (overlap counted once) -----
    val occ = base.select(col(idCol),
      posexplode(grams(col("_tk"), 5)).as(Seq("_p", "_w")))
    val dupWins = occ.groupBy(col(idCol), col("_w"))
      .agg(count(lit(1)).as("_c")).filter(col("_c") >= 2)
      .select(col(idCol), col("_w"))
    val coveredPos = occ.join(dupWins, Seq(idCol, "_w"))
      .select(col(idCol), explode(sequence(col("_p"), col("_p") + 4)).as("_pos"))
      .distinct()
    val cov5 = coveredPos
      .join(base.select(col(idCol), col("_tk")), idCol)
      .groupBy(idCol)
      .agg(sum(length(element_at(col("_tk"), col("_pos") + 1)).cast("long"))
        .as("_cov"))
    val tokChars = base.select(col(idCol),
      aggregate(col("_tk"), lit(0L), (a, t) => a + length(t).cast("long"))
        .as("_tkc"))
    val dup5 = tokChars.join(cov5, Seq(idCol), "left")
      .select(col(idCol),
        when(col("_tkc") > 0,
          r6(coalesce(col("_cov"), lit(0L)).cast("double") /
            col("_tkc").cast("double"))).otherwise(0.0)
          .as("dup_5gram_char_frac"))

    lines
      .join(top2, Seq(idCol), "left")
      .join(dup5, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"), col("dup_line_frac"),
        col("dup_line_char_frac"),
        coalesce(col("top_2gram_char_frac"), lit(0.0))
          .as("top_2gram_char_frac"),
        coalesce(col("dup_5gram_char_frac"), lit(0.0))
          .as("dup_5gram_char_frac"))
      .withColumn("pass",
        col("dup_line_frac") <= MaxDupLineFrac &&
          col("dup_line_char_frac") <= MaxDupLineCharFrac &&
          col("top_2gram_char_frac") <= MaxTop2GramCharFrac &&
          col("dup_5gram_char_frac") <= MaxDup5GramCharFrac)
  }

  /** [[report]] as a PURE PER-ROW PROJECTION — every metric is a
    * function of one document, so the explode/groupBy shapes above
    * can instead run as higher-order functions over the row's own
    * arrays: zero exchanges, no state, automatically
    * streaming-capable (the nearestSeedRowwise trade). Cost is
    * O(G²) in the doc's own gram count (G ≈ tokens — doc-bounded),
    * vs the shuffle version's O(G) per row + two doc-keyed
    * exchanges: prefer THIS for streams and pipelines fused into one
    * projection pass, the shuffle form when docs are huge — and on
    * corpora that may contain PATHOLOGICALLY long documents, use
    * [[reportCapped]]: this uncapped form makes a 50k-token doc a
    * 2.5×10⁹-comparison task straggler. Output is
    * bit-identical ([[RepetitionSpec]] locks it): same counts, same
    * lex-min top gram (array_min's UTF8 byte order = the shuffle
    * version's ORDER BY), same interval-union coverage.
    */
  def reportRowwise(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    kernelProject(docs, idCol, GopherExpressions.basic(col(textCol)), basicFields)

  /** The PRIOR interpreted-HOF row-wise form (O(G²)/row), kept as an
    * executable spec (RepetitionSpec locks it bit-identical to
    * [[reportRowwise]]).
    */
  def reportRowwiseHof(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol),
      col(textCol).as("_txt"),
      split(col(textCol), "\n").as("_ln"),
      Text.tokens(translate(col(textCol), "\n", " ")).as("_tk"))
    rowwiseFrom(base, idCol, Nil)
  }

  /** [[reportRowwise]] with a LONG-DOCUMENT GUARD: the row-wise form
    * is O(G²) in the doc's own gram count by design (the zero-exchange
    * trade), so a pathological 50k-token web document is a
    * 2.5×10⁹-comparison task straggler. Here metrics are computed on
    * a CAPPED PREFIX with defined semantics — first `maxLines` lines,
    * then the first `maxTokens` tokens of that line-capped text (the
    * top-2-gram char denominator is the line-capped text's length) —
    * and a `truncated` flag (between `dup_5gram_char_frac` and
    * `pass`) records whether either cap bit. On docs under both caps
    * the output rows equal
    * [[reportRowwise]]'s exactly (plus `truncated = false`), so the
    * guard is free to leave on at ingest; bounded per-row cost is
    * O(maxTokens²) regardless of input size (RepetitionSpec
    * time-bounds a 50k-token doc).
    */
  def reportCapped(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, maxLines: Int): DataFrame = {
    require(maxTokens > 0 && maxLines > 0, "caps must be positive")
    kernelProject(docs, idCol,
      GopherExpressions.capped(col(textCol), maxTokens, maxLines),
      basicFields.init ++ Seq("truncated", "pass"))
  }

  /** The PRIOR HOF capped form, kept as an executable spec
    * (RepetitionSpec locks it bit-identical to [[reportCapped]]).
    */
  def reportCappedHof(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, maxLines: Int): DataFrame = {
    require(maxTokens > 0 && maxLines > 0, "caps must be positive")
    val base = docs.select(col(idCol),
        split(col(textCol), "\n").as("_lnAll"))
      .withColumn("_ln", slice(col("_lnAll"), 1, maxLines))
      .withColumn("_txt", array_join(col("_ln"), "\n"))
      .withColumn("_tkAll", Text.tokens(translate(col("_txt"), "\n", " ")))
      .withColumn("_tk", slice(col("_tkAll"), 1, maxTokens))
      .withColumn("_trunc",
        size(col("_lnAll")) > maxLines || size(col("_tkAll")) > maxTokens)
    rowwiseFrom(base, idCol, Seq(col("_trunc").as("truncated")))
  }

  /** The shared row-wise kernel over a staged (`_txt`,`_ln`,`_tk`)
    * frame; `extra` columns (e.g. the cap's `truncated` flag) ride
    * through to the output after `pass`.
    *
    * EVALUATION SHAPE: higher-order functions are INTERPRETED (no
    * codegen, no cross-invocation CSE), so any non-trivial
    * expression referenced INSIDE a lambda is re-evaluated per array
    * element. The gram arrays are therefore staged as COLUMNS in a
    * separate projection, and every lambda touches only attribute
    * references — each gram array is built once per row, and the
    * per-row cost is the honest O(G²) comparisons, not O(G²) array
    * RECONSTRUCTIONS (observed 50×: a per-position exists() over an
    * inlined flags tree wedged a task for minutes at 90-token docs).
    * Each staged column is referenced more than once downstream,
    * which is also what keeps CollapseProject from inlining it back.
    */
  private def rowwiseFrom(base: DataFrame, idCol: String,
      extra: Seq[Column]): DataFrame = {
    val staged = base
      .withColumn("_g2", grams(col("_tk"), 2))
      .withColumn("_w5", grams(col("_tk"), 5))
      .withColumn("_c2",
        transform(col("_g2"), g => size(filter(col("_g2"), x => x === g))))
      .withColumn("_f5",
        transform(col("_w5"), w =>
          size(filter(col("_w5"), x => x === w)) >= 2))

    val nLines = size(col("_ln"))
    val lineChars = aggregate(col("_ln"), lit(0L),
      (a, l) => a + length(l).cast("long"))
    val dupLineChars = aggregate(col("_ln"), lit(0L), (a, l) =>
      a + when(size(filter(col("_ln"), x => x === l)) >= 2,
        length(l).cast("long")).otherwise(lit(0L)))

    val max2 = array_max(col("_c2"))
    // lex-min gram among the max-count ones: nulls (non-max) are
    // ignored by array_min; string min = UTF8 byte order
    val topG = array_min(zip_with(col("_g2"), col("_c2"),
      (g, c) => when(c === max2, g)))
    val top2Frac = when(size(col("_g2")) > 0,
      r6((max2 * length(topG)).cast("double") /
        length(col("_txt")).cast("double"))).otherwise(0.0)

    // covered positions = union of [j, j+4] over duplicated windows j;
    // zip_with evaluates each input array once per row
    val covered = when(size(col("_w5")) > 0,
      array_distinct(flatten(zip_with(col("_f5"),
        sequence(lit(0), greatest(size(col("_w5")) - 1, lit(0))),
        (f, j) => when(f, sequence(j, j + 4))
          .otherwise(array().cast("array<int>"))))))
      .otherwise(array().cast("array<int>"))
    val covChars = aggregate(covered, lit(0L),
      (a, p) => a + length(element_at(col("_tk"), p + 1)).cast("long"))
    val tokChars = aggregate(col("_tk"), lit(0L),
      (a, t) => a + length(t).cast("long"))
    val dup5Frac = when(tokChars > 0,
      r6(covChars.cast("double") / tokChars.cast("double"))).otherwise(0.0)

    staged.select(Seq(col(idCol),
      nLines.cast("long").as("n_lines"),
      r6((nLines - size(array_distinct(col("_ln")))).cast("double") /
        nLines.cast("double")).as("dup_line_frac"),
      when(lineChars > 0,
        r6(dupLineChars.cast("double") / lineChars.cast("double")))
        .otherwise(0.0).as("dup_line_char_frac"),
      top2Frac.as("top_2gram_char_frac"),
      dup5Frac.as("dup_5gram_char_frac")) ++ extra: _*)
      .withColumn("pass",
        col("dup_line_frac") <= MaxDupLineFrac &&
          col("dup_line_char_frac") <= MaxDupLineCharFrac &&
          col("top_2gram_char_frac") <= MaxTop2GramCharFrac &&
          col("dup_5gram_char_frac") <= MaxDup5GramCharFrac)
  }

  val MaxDupParaFrac = 0.30
  val MaxDupParaCharFrac = 0.20
  /** Table A1 thresholds: top-n-gram char fraction, n = 2, 3, 4. */
  val TopNGramThresholds: Seq[(Int, Double)] =
    Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  /** Table A1 thresholds: dup-n-gram char coverage, n = 5..10. */
  val DupNGramThresholds: Seq[(Int, Double)] =
    Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11,
      10 -> 0.10)

  /** n-gram windows tagged with their size and 1-based start: an
    * array of (_n, _p, _w) structs, so several n sizes can share one
    * explode (the flatten-of-arrays is built per row from attribute
    * references only — the staged-columns HOF discipline).
    */
  private def gramsPos(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - (n - 1)),
        i => struct(lit(n).as("_n"), i.as("_p"),
          concat_ws(" ", slice(tk, i, lit(n))).as("_w"))))
      .otherwise(array().cast("array<struct<_n:int,_p:int,_w:string>>"))

  /** The COMPLETE Gopher Table A1 repetition half (Rae et al. 2021):
    * [[report]]'s four metrics plus PARAGRAPH duplicates (split on a
    * blank line, empty segments dropped; same dual convention as
    * lines — excess-copies for the fraction, whole-group for char
    * coverage), top-{2,3,4}-gram char fractions, and duplicated
    * {5..10}-gram char COVERAGE (interval union per n, overlaps
    * counted once) — all thirteen thresholds of the paper's
    * repetition rules under one `pass` conjunction.
    *
    * 100 TB shape: ONE exchange per metric FAMILY, not per n — the
    * three top-n gram streams ride a single tagged (doc, n, gram)
    * explode with map-side partial counts and a window partitioned
    * by (doc, n); the six dup-n window streams ride a single tagged
    * (doc, n, pos, window) explode (same two-pass
    * duplicate-window → covered-position union as [[report]], the n
    * tag just widens the key). Keys are always doc-scoped — never
    * corpus-sized. Every ratio is one IEEE division of exact
    * integers rounded 6 dp, so the DuckDB oracle replays
    * bit-for-bit. A doc with no paragraphs after the empty filter
    * (empty text) scores 0.0 on the paragraph metrics via the left
    * join, mirroring [[report]]'s n-gram convention.
    */
  private val fullFields = Seq("n_lines", "dup_line_frac",
    "dup_line_char_frac", "n_paras", "dup_para_frac", "dup_para_char_frac") ++
    TopNGramThresholds.map { case (n, _) => s"top_${n}gram_char_frac" } ++
    DupNGramThresholds.map { case (n, _) => s"dup_${n}gram_char_frac" } ++
    Seq("pass")

  /** All thirteen Table A1 metrics — kernel projection (see
    * [[kernelProject]]).
    */
  def reportFull(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    kernelProject(docs, idCol, GopherExpressions.full(col(textCol)), fullFields)

  /** The PRIOR batch/shuffle full form (one tagged exchange per metric
    * family), kept as an executable spec (RepetitionSpec locks it
    * bit-identical to [[reportFull]]); superseded as the default by
    * the zero-exchange O(G)-per-row kernel.
    */
  def reportFullShuffle(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol),
        col(textCol).as("_txt"),
        split(col(textCol), "\n").as("_ln"),
        filter(split(col(textCol), "\n\n"), p => length(p) > 0).as("_pg"),
        Text.tokens(translate(col(textCol), "\n", " ")).as("_tk"))
      .persistTracked

    // ---- line + paragraph duplicates: explode → within-doc groups --
    def dupGroups(arr: String, nName: String, fName: String,
        cfName: String): DataFrame = {
      val gc = (col("_c") * length(col("_e")).cast("long"))
      base.select(col(idCol), explode(col(arr)).as("_e"))
        .groupBy(col(idCol), col("_e"))
        .agg(count(lit(1)).as("_c"))
        .groupBy(idCol)
        .agg(sum(col("_c")).as("_n"),
          count(lit(1)).as("_d"),
          sum(gc).as("_tc"),
          sum(when(col("_c") >= 2, gc).otherwise(0L)).as("_dc"))
        .select(col(idCol),
          col("_n").as(nName),
          r6((col("_n") - col("_d")).cast("double") /
            col("_n").cast("double")).as(fName),
          when(col("_tc") > 0,
            r6(col("_dc").cast("double") / col("_tc").cast("double")))
            .otherwise(0.0).as(cfName))
    }
    val lines = dupGroups("_ln", "n_lines", "dup_line_frac",
      "dup_line_char_frac")
    val paras = dupGroups("_pg", "n_paras", "dup_para_frac",
      "dup_para_char_frac")

    // ---- top-{2,3,4}-gram char fractions: ONE tagged exchange ------
    val topNs = TopNGramThresholds.map(_._1)
    val topOcc = base.select(col(idCol), length(col("_txt")).as("_tc"),
        explode(flatten(array(topNs.map(n =>
          transform(grams(col("_tk"), n),
            g => struct(lit(n).as("_n"), g.as("_g")))): _*))).as("_s"))
      .select(col(idCol), col("_tc"),
        col("_s._n").as("_n"), col("_s._g").as("_g"))
    val byDocN = Window.partitionBy(col(idCol), col("_n"))
    val topAggs = topNs.map(n => max(when(col("_n") === n,
      r6((col("_c") * length(col("_g"))).cast("double") /
        col("_tc").cast("double"))))
      .as(s"top_${n}gram_char_frac"))
    val topN = topOcc
      .groupBy(col(idCol), col("_tc"), col("_n"), col("_g"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_rn", row_number().over(
        byDocN.orderBy(col("_c").desc, col("_g"))))
      .filter(col("_rn") === 1)
      .groupBy(idCol)
      .agg(topAggs.head, topAggs.tail: _*)

    // ---- dup-{5..10}-gram char coverage: ONE tagged exchange -------
    // occ is referenced twice (duplicate-window detection + the
    // position join-back) with no exchange reuse between the two
    // subtrees — persist so the 6-family struct build + explode runs
    // ONCE. Measured isolated at sf0.1 (min of 3): 18.1 s
    // un-persisted → 11.2 s; merging the top-n families into this
    // explode with a shared (doc, n, window) count aggregate was
    // TRIED and measured WORSE (14.7–16.8 s: 1.5× persisted rows +
    // a second persisted frame + an extra join for the text length
    // outweigh the saved explode), so the two families stay separate.
    val dupNs = DupNGramThresholds.map(_._1)
    val occ = base.select(col(idCol),
        explode(flatten(array(dupNs.map(n =>
          gramsPos(col("_tk"), n)): _*))).as("_s"))
      .select(col(idCol), col("_s._n").as("_n"),
        col("_s._p").as("_p"), col("_s._w").as("_w"))
      .persistTracked
    val dupWins = occ.groupBy(col(idCol), col("_n"), col("_w"))
      .agg(count(lit(1)).as("_c")).filter(col("_c") >= 2)
      .select(col(idCol), col("_n"), col("_w"))
    val coveredPos = occ.join(dupWins, Seq(idCol, "_n", "_w"))
      .select(col(idCol), col("_n"),
        explode(sequence(col("_p"), col("_p") + col("_n") - 1)).as("_pos"))
      .distinct()
    val covAggs = dupNs.map(n =>
      max(when(col("_n") === n, col("_cov"))).as(s"_cov$n"))
    val covN = coveredPos
      .join(base.select(col(idCol), col("_tk")), idCol)
      .groupBy(col(idCol), col("_n"))
      .agg(sum(length(element_at(col("_tk"), col("_pos"))).cast("long"))
        .as("_cov"))
      .groupBy(idCol)
      .agg(covAggs.head, covAggs.tail: _*)
    val tokChars = base.select(col(idCol),
      aggregate(col("_tk"), lit(0L), (a, t) => a + length(t).cast("long"))
        .as("_tkc"))

    val dupCols = dupNs.map(n =>
      when(col("_tkc") > 0,
        r6(coalesce(col(s"_cov$n"), lit(0L)).cast("double") /
          col("_tkc").cast("double"))).otherwise(0.0)
        .as(s"dup_${n}gram_char_frac"))
    val out = lines
      .join(paras, Seq(idCol), "left")
      .join(topN, Seq(idCol), "left")
      .join(tokChars, Seq(idCol))
      .join(covN, Seq(idCol), "left")
      .select(Seq(col(idCol), col("n_lines"), col("dup_line_frac"),
        col("dup_line_char_frac"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("dup_para_frac"), lit(0.0)).as("dup_para_frac"),
        coalesce(col("dup_para_char_frac"), lit(0.0))
          .as("dup_para_char_frac")) ++
        topNs.map(n => coalesce(col(s"top_${n}gram_char_frac"), lit(0.0))
          .as(s"top_${n}gram_char_frac")) ++
        dupCols: _*)
    val pass = (Seq(
      col("dup_line_frac") <= MaxDupLineFrac,
      col("dup_line_char_frac") <= MaxDupLineCharFrac,
      col("dup_para_frac") <= MaxDupParaFrac,
      col("dup_para_char_frac") <= MaxDupParaCharFrac) ++
      TopNGramThresholds.map { case (n, t) =>
        col(s"top_${n}gram_char_frac") <= t } ++
      DupNGramThresholds.map { case (n, t) =>
        col(s"dup_${n}gram_char_frac") <= t }).reduce(_ && _)
    out.withColumn("pass", pass)
  }

  /** [[reportFull]] as a PURE PER-ROW PROJECTION — the
    * [[reportRowwise]] trade applied to all thirteen Table A1
    * metrics: zero exchanges, no state, streaming-capable at ingest;
    * bit-identical output (RepetitionSpec locks it; q222 gates the
    * stream against q217's SQL verbatim). Cost is O(G²)/row PER GRAM
    * FAMILY (nine families: counts for n = 2,3,4, duplicate flags
    * for n = 5..10) — doc-bounded, and every gram array and derived
    * count/flag array is STAGED AS A COLUMN before any lambda reads
    * it (interpreted HOFs re-evaluate non-trivial subtrees per
    * element; the q199 lesson). On corpora that may contain
    * pathologically long documents, prefer the shuffle form
    * [[reportFull]] — there is deliberately no capped variant here:
    * thirteen capped metrics would silently change the `pass`
    * semantics of the paper's thresholds. What `maxLines` adds is a
    * LOUD GUARD, not a cap (VERDICT r18 item 7): the line/paragraph
    * dup-char folds are O(lines²) per row with no prefix signal to
    * prune on, so a single 20k-line document stalls a whole stream
    * trigger. With `maxLines` set, a document over the limit fails
    * the job with a counted raise_error naming the doc and its line
    * count (route that corpus to [[reportFull]] instead); documents
    * under the limit — and the default Int.MaxValue, which injects
    * NO guard expression at all — compute bit-identically to before,
    * `pass` semantics untouched.
    */
  def reportFullRowwise(docs: DataFrame, idCol: String,
      textCol: String, maxLines: Int = Int.MaxValue): DataFrame = {
    require(maxLines > 0, "maxLines must be positive")
    val m =
      if (maxLines == Int.MaxValue) GopherExpressions.full(col(textCol))
      else GopherExpressions.fullGuarded(col(idCol).cast("string"),
        col(textCol), maxLines)
    kernelProject(docs, idCol, m, fullFields)
  }

  /** The PRIOR interpreted-HOF full row-wise form (O(G²)/row per gram
    * family, subsumption-pruned), kept as an executable spec
    * (RepetitionSpec locks it bit-identical to [[reportFullRowwise]]).
    */
  def reportFullRowwiseHof(docs: DataFrame, idCol: String,
      textCol: String, maxLines: Int = Int.MaxValue): DataFrame = {
    require(maxLines > 0, "maxLines must be positive")
    val topNs = TopNGramThresholds.map(_._1)
    val dupNs = DupNGramThresholds.map(_._1)
    val lnRaw = split(col(textCol), "\n")
    val lnGuarded =
      if (maxLines == Int.MaxValue) lnRaw
      else when(size(lnRaw) <= maxLines, lnRaw)
        .otherwise(raise_error(concat(
          lit("reportFullRowwise: document "), col(idCol).cast("string"),
          lit(" has "), size(lnRaw).cast("string"),
          lit(s" lines > maxLines=$maxLines — the O(lines²) " +
            "dup-line char fold would straggle this stream; route the " +
            "corpus to reportFull (shuffle form) or raise the guard"))))
    val staged = docs.select(col(idCol),
        col(textCol).as("_txt"),
        lnGuarded.as("_ln"),
        filter(split(col(textCol), "\n\n"), p => length(p) > 0).as("_pg"),
        Text.tokens(translate(col(textCol), "\n", " ")).as("_tk"))
      .withColumns(topNs.map(n => s"_g$n" -> grams(col("_tk"), n)).toMap)
      .withColumns(dupNs.map(n => s"_w$n" -> grams(col("_tk"), n)).toMap)
      // SUBSUMPTION PRUNE — only TWO full O(G²) passes per row (the
      // 2-gram counts and the 5-gram flags); everything longer is
      // gated by its prefix: an n-gram with count ≥ 2 forces its
      // 2-gram prefix count ≥ 2, and a duplicated n ≥ 6 window
      // forces its 5-gram prefix duplicated — so positions whose
      // cheap prefix signal is negative skip the expensive refilter
      // (their exact value is KNOWN: count 1 / not duplicated; the
      // full-vs-shuffle bit-identity spec covers the planted dup
      // docs). CaseWhen evaluates branches lazily per element, which
      // is what makes the guard a prune rather than decoration.
      // Measured at sf0.1 (q222, full suite vs isolated min-of-2):
      // 26.5 s unpruned → 13.1 s pruned.
      .withColumn("_c2", transform(col("_g2"),
        g => size(filter(col("_g2"), x => x === g))))
      .withColumn("_f5", transform(col("_w5"),
        w => size(filter(col("_w5"), x => x === w)) >= 2))
      .withColumns(topNs.filterNot(_ == 2).map(n => s"_c$n" ->
        zip_with(col(s"_g$n"), slice(col("_c2"), lit(1), size(col(s"_g$n"))),
          (g, c2) => when(c2 >= 2,
            size(filter(col(s"_g$n"), x => x === g))).otherwise(lit(1)))).toMap)
      .withColumns(dupNs.filterNot(_ == 5).map(n => s"_f$n" ->
        zip_with(col(s"_w$n"), slice(col("_f5"), lit(1), size(col(s"_w$n"))),
          (w, f5) => when(f5,
            size(filter(col(s"_w$n"), x => x === w)) >= 2)
            .otherwise(lit(false)))).toMap)

    def dupUnit(arr: Column): (Column, Column, Column) = {
      val n = size(arr)
      val chars = aggregate(arr, lit(0L),
        (a, u) => a + length(u).cast("long"))
      val dupChars = aggregate(arr, lit(0L), (a, u) =>
        a + when(size(filter(arr, x => x === u)) >= 2,
          length(u).cast("long")).otherwise(lit(0L)))
      (n.cast("long"),
        when(n > 0, r6((n - size(array_distinct(arr))).cast("double") /
          n.cast("double"))).otherwise(0.0),
        when(chars > 0, r6(dupChars.cast("double") / chars.cast("double")))
          .otherwise(0.0))
    }
    val (nLines, dupLineFrac, dupLineCharFrac) = dupUnit(col("_ln"))
    val (nParas, dupParaFrac, dupParaCharFrac) = dupUnit(col("_pg"))

    def topFrac(n: Int): Column = {
      val maxN = array_max(col(s"_c$n"))
      val topG = array_min(zip_with(col(s"_g$n"), col(s"_c$n"),
        (g, c) => when(c === maxN, g)))
      when(size(col(s"_g$n")) > 0,
        r6((maxN * length(topG)).cast("double") /
          length(col("_txt")).cast("double"))).otherwise(0.0)
    }

    val tokChars = aggregate(col("_tk"), lit(0L),
      (a, t) => a + length(t).cast("long"))
    def dupFrac(n: Int): Column = {
      val covered = when(size(col(s"_w$n")) > 0,
        array_distinct(flatten(zip_with(col(s"_f$n"),
          sequence(lit(0), greatest(size(col(s"_w$n")) - 1, lit(0))),
          (f, j) => when(f, sequence(j, j + (n - 1)))
            .otherwise(array().cast("array<int>"))))))
        .otherwise(array().cast("array<int>"))
      val covChars = aggregate(covered, lit(0L),
        (a, p) => a + length(element_at(col("_tk"), p + 1)).cast("long"))
      when(tokChars > 0,
        r6(covChars.cast("double") / tokChars.cast("double")))
        .otherwise(0.0)
    }

    val out = staged.select(Seq(col(idCol),
      nLines.as("n_lines"),
      dupLineFrac.as("dup_line_frac"),
      dupLineCharFrac.as("dup_line_char_frac"),
      nParas.as("n_paras"),
      dupParaFrac.as("dup_para_frac"),
      dupParaCharFrac.as("dup_para_char_frac")) ++
      topNs.map(n => topFrac(n).as(s"top_${n}gram_char_frac")) ++
      dupNs.map(n => dupFrac(n).as(s"dup_${n}gram_char_frac")): _*)
    val pass = (Seq(
      col("dup_line_frac") <= MaxDupLineFrac,
      col("dup_line_char_frac") <= MaxDupLineCharFrac,
      col("dup_para_frac") <= MaxDupParaFrac,
      col("dup_para_char_frac") <= MaxDupParaCharFrac) ++
      TopNGramThresholds.map { case (n, t) =>
        col(s"top_${n}gram_char_frac") <= t } ++
      DupNGramThresholds.map { case (n, t) =>
        col(s"dup_${n}gram_char_frac") <= t }).reduce(_ && _)
    out.withColumn("pass", pass)
  }
}
