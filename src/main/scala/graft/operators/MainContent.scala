package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MAIN-CONTENT extraction from raw HTML — jusText/Boilerpipe-style
  * WITHIN-PAGE block classification (Pomikálek 2011 "Removing
  * boilerplate and duplicate content from web corpora" §3; Kohlschütter
  * et al. WSDM 2010): the step between a crawled page and every
  * quality filter, which [[HtmlClean]] (whole-page tag strip) and
  * [[Boilerplate]]/[[LineDedup]] (CROSS-doc repeated lines) do not
  * cover — nav bars, link lists and footers are boilerplate on their
  * FIRST occurrence, detectable from within-page signals alone.
  *
  * Pipeline (all deterministic, SQL-replayable):
  *  1. BLOCK SPLIT on structural tag boundaries (p/div/h1-6/li/td/…) —
  *     the [[MainContent.BlockSplitPattern]] regex, restricted to the
  *     Java∩RE2-agreeing dialect subset (the q155 Redact discipline)
  *     so DuckDB splits byte-identically;
  *  2. per block: tag-stripped whitespace-collapsed TEXT, and the
  *     LINK text captured from simple `<a …>text</a>` spans (anchors
  *     with nested markup are not counted — documented limitation;
  *     they classify via the other signals). Empty-text blocks
  *     (adjacent structural tags) are dropped BEFORE classification
  *     so they cannot dilute the context pass;
  *  3. per-block densities: `n_words` (single-space tokens of the
  *     collapsed text), `link_density` = link chars / text chars,
  *     `stop_frac` = stop-word tokens / words (lowercased exact match
  *     against [[MainContent.StopWords]]);
  *  4. INITIAL CLASS: `bad` if link_density > maxLinkDensity; else
  *     `short` if n_words < minWords; else `good` if stop_frac ≥
  *     stopHigh; else `near_good` if stop_frac ≥ stopLow; else `bad`;
  *  5. CONTEXT PASS: `short` and `near_good` blocks become `good`
  *     when an IMMEDIATE neighbor's initial class is `good`, else
  *     `bad` (one deterministic pass over the block array; full
  *     jusText looks across runs of short blocks — this operator
  *     deliberately uses the single-step rule so the whole decision
  *     replays as one SQL expression).
  *
  * 100 TB shape: every step is a function of ONE document — block
  * arrays are STAGED AS COLUMNS (the [[Repetition]] interpreted-HOF
  * lesson) and the whole operator is a zero-exchange per-row
  * projection, O(page length) per row: batch and streaming run the
  * SAME code (q211 gates stream ≡ batch bit-for-bit). Nothing about
  * a page's own boilerplate needs cross-doc state; compose with
  * [[Boilerplate]]/[[LineDedup]] afterwards for cross-doc templates.
  */
object MainContent {

  /** Structural (block-level) HTML tags — a boundary between content
    * units. `(?:[ \t\n\r][^>]*)?` eats attributes; `/?` accepts
    * self-closing; `(?i)` both dialects. `\s`/`\b` are AVOIDED: their
    * semantics differ between Java regex and RE2.
    */
  val BlockSplitPattern: String =
    "(?i)</?(?:p|div|h[1-6]|ul|ol|li|table|tr|td|th|section|article|" +
      "header|footer|nav|aside|blockquote|pre|form|br)(?:[ \t\n\r][^>]*)?/?>"

  /** Simple anchor spans: capture group 1 = the anchor text (no
    * nested tags — `[^<]*`).
    */
  val AnchorPattern: String = "(?i)<a[ \t\n\r][^>]*>([^<]*)</a>"

  /** 30 high-frequency English function words (the jusText stoplist
    * idea at a fixed, documented size — tune per language corpus).
    */
  val StopWords: Seq[String] = Seq(
    "the", "of", "and", "to", "in", "a", "is", "that", "it", "was",
    "for", "on", "are", "with", "as", "be", "at", "by", "this", "have",
    "from", "or", "had", "not", "but", "what", "all", "were", "we",
    "when")

  val DefaultMaxLinkDensity = 0.35
  val DefaultMinWords = 8
  val DefaultStopHigh = 0.30
  val DefaultStopLow = 0.15

  private def r6(c: Column): Column = round(c, 6)

  /** Tag-strip + whitespace-collapse + trim, the block-text
    * normalization (both regexes in the agreeing dialect subset).
    */
  private def blockText(b: Column): Column =
    trim(regexp_replace(regexp_replace(b, "<[^>]*>", " "),
      "[ \t\n\r]+", " "))

  /** Total characters of simple-anchor text in the raw block, after
    * the SAME collapse+trim normalization as the block text, so
    * link_density is a ratio of like measures.
    */
  private def linkChars(b: Column): Column =
    aggregate(regexp_extract_all(b, lit(AnchorPattern), lit(1)),
      lit(0L),
      (a, s) => a + length(trim(regexp_replace(s, "[ \t\n\r]+", " ")))
        .cast("long"))

  /** 1-based index-driven transform over `arr`'s positions, safe on
    * EMPTY arrays: `sequence(1, 0)` DESCENDS to [1, 0] rather than
    * being empty, so the index range must be gated on the size (found
    * live: an ANSI element_at(…, 1) throw on a zero-block page).
    */
  private def transformIdx(arr: Column, resultType: String,
      f: Column => Column): Column =
    when(size(arr) > 0, transform(sequence(lit(1), size(arr)), f))
      .otherwise(array().cast(s"array<$resultType>"))

  /** The staged per-doc block frame: `_bt` block texts (non-empty
    * only), `_lc` their anchor-char counts, `_nw` word counts, `_sf`
    * stop fractions, `_ld` link densities, `_cls` initial classes,
    * `_fin` context-fixed classes. Every array is a COLUMN (staged
    * projections — interpreted HOFs re-evaluate inlined subtrees per
    * element, the q199 lesson).
    */
  private def staged(docs: DataFrame, idCol: String, htmlCol: String,
      maxLinkDensity: Double, minWords: Int,
      stopHigh: Double, stopLow: Double,
      stopWords: Seq[String]): DataFrame = {
    val stops = array(stopWords.map(lit(_)): _*)
    docs
      // NULL page → zero blocks / empty content, never a null row
      // (the GopherQuality null discipline)
      .select(col(idCol),
        split(coalesce(col(htmlCol), lit("")), BlockSplitPattern).as("_bk"))
      .withColumn("_bs", filter(
        transform(col("_bk"), b =>
          struct(blockText(b).as("t"), linkChars(b).as("l"))),
        s => length(s.getField("t")) > 0))
      .withColumn("_bt", transform(col("_bs"), s => s.getField("t")))
      .withColumn("_lc", transform(col("_bs"), s => s.getField("l")))
      .withColumn("_tk", transform(col("_bt"), t => split(t, " ")))
      .withColumn("_nw", transform(col("_tk"), w => size(w).cast("long")))
      .withColumn("_sf", transform(col("_tk"), w =>
        r6(size(filter(w, t => array_contains(stops, lower(t))))
          .cast("double") / size(w).cast("double"))))
      .withColumn("_ld", transformIdx(col("_bt"), "double", i =>
        r6(element_at(col("_lc"), i).cast("double") /
          length(element_at(col("_bt"), i)).cast("double"))))
      .withColumn("_cls", transformIdx(col("_bt"), "string", i =>
        when(element_at(col("_ld"), i) > maxLinkDensity, "bad")
          .when(element_at(col("_nw"), i) < minWords, "short")
          .when(element_at(col("_sf"), i) >= stopHigh, "good")
          .when(element_at(col("_sf"), i) >= stopLow, "near_good")
          .otherwise("bad")))
      .withColumn("_fin", transformIdx(col("_cls"), "string", i =>
        when(element_at(col("_cls"), i) === "good", "good")
          .when(element_at(col("_cls"), i) === "bad", "bad")
          .otherwise( // short / near_good: promoted by a good neighbor
            // (both element_at accesses guarded — ANSI throws on
            // out-of-range array indices)
            when(
              coalesce(when(i > 1, element_at(col("_cls"), i - 1)),
                lit("")) === "good" ||
                coalesce(
                  when(i < size(col("_cls")),
                    element_at(col("_cls"), i + 1)),
                  lit("")) === "good",
              "good").otherwise("bad"))))
  }

  /** Extraction: one row per doc — `n_blocks` (non-empty text
    * blocks), `n_kept`, and `content` = the kept blocks joined by
    * `\n` ("" when nothing survives).
    */
  def extract(docs: DataFrame, idCol: String, htmlCol: String,
      maxLinkDensity: Double = DefaultMaxLinkDensity,
      minWords: Int = DefaultMinWords,
      stopHigh: Double = DefaultStopHigh,
      stopLow: Double = DefaultStopLow,
      stopWords: Seq[String] = StopWords): DataFrame =
    staged(docs, idCol, htmlCol, maxLinkDensity, minWords, stopHigh,
      stopLow, stopWords)
      .select(col(idCol),
        size(col("_bt")).cast("long").as("n_blocks"),
        size(filter(col("_fin"), c => c === "good")).cast("long")
          .as("n_kept"),
        array_join(
          zip_with(col("_bt"), col("_fin"),
            (t, c) => when(c === "good", t)),
          "\n").as("content"))

  /** Per-block diagnostics: (id, block_idx 1-based, n_words,
    * link_density, stop_frac, cls, final) — the q210 gate on every
    * density and class decision.
    */
  def blockReport(docs: DataFrame, idCol: String, htmlCol: String,
      maxLinkDensity: Double = DefaultMaxLinkDensity,
      minWords: Int = DefaultMinWords,
      stopHigh: Double = DefaultStopHigh,
      stopLow: Double = DefaultStopLow,
      stopWords: Seq[String] = StopWords): DataFrame =
    staged(docs, idCol, htmlCol, maxLinkDensity, minWords, stopHigh,
      stopLow, stopWords)
      .select(col(idCol), col("_nw"), col("_sf"), col("_ld"),
        col("_cls"), col("_fin"),
        posexplode(col("_bt")).as(Seq("_p", "_t")))
      .select(col(idCol),
        (col("_p") + 1).cast("long").as("block_idx"),
        element_at(col("_nw"), col("_p") + 1).as("n_words"),
        element_at(col("_ld"), col("_p") + 1).as("link_density"),
        element_at(col("_sf"), col("_p") + 1).as("stop_frac"),
        element_at(col("_cls"), col("_p") + 1).as("cls"),
        element_at(col("_fin"), col("_p") + 1).as("final"))
}
