package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Gopher-style DOCUMENT-FORMAT quality filter (Rae et al., "Scaling
  * Language Models: Methods, Analysis & Insights from Training
  * Gopher", 2021, Table A1) — the threshold-complete FORMAT half of
  * the Gopher rules, complementing [[Repetition]]'s within-document
  * repetition half. One named operator a 100 TB pipeline reaches for
  * at ingest:
  *
  *  - `n_words`             — whitespace-token count, bounds [50, 100k];
  *  - `mean_word_len`       — mean token length in chars, bounds [3, 10];
  *  - `hash_word_ratio`     — '#' characters per word, ≤ 0.1;
  *  - `ellipsis_word_ratio` — ellipsis occurrences per word ("..."
  *                            counted greedily non-overlapping, plus
  *                            the one-char "…"), ≤ 0.1;
  *  - `bullet_line_frac`    — fraction of lines whose trimmed start is
  *                            a bullet marker ("• ", "- ", "* "), ≤ 0.90;
  *  - `ellipsis_line_frac`  — fraction of lines whose trimmed end is an
  *                            ellipsis, ≤ 0.30;
  *  - `alpha_word_frac`     — fraction of words containing ≥ 1 ASCII
  *                            letter, ≥ 0.80;
  *  - `stop_hits`           — DISTINCT stop words present (of Gopher's
  *                            the/be/to/of/and/that/have/with,
  *                            lowercased match), ≥ 2.
  *
  * `pass` is the conjunction of all eight thresholds. Thresholds are
  * DEFAULTED PARAMETERS (Gopher's Table A1 values) — a real user
  * tunes them per corpus, the way [[Repetition.reportCapped]] takes
  * its caps. A NULL text column yields all-zero counts/ratios and
  * `pass = false` (the same `when`-guard discipline on every
  * denominator — no silent null rows).
  *
  * 100 TB shape: every metric is a function of ONE document — the
  * whole report is a single per-row projection of higher-order
  * functions and string kernels, zero exchanges, O(doc length) per
  * row. That also makes it automatically streaming-capable: apply the
  * same function to a `readStream` frame and the filter runs at
  * ingest with no state store (the q199 discipline; q204 gates stream
  * ≡ batch bit-for-bit). Every ratio is one IEEE division of exact
  * integer counts rounded 6 dp, so a SQL oracle replays bit-for-bit.
  */
object GopherQuality {

  val MinWords = 50L
  val MaxWords = 100000L
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MaxSymbolWordRatio = 0.1 // each of hash and ellipsis
  val MaxBulletLineFrac = 0.90
  val MaxEllipsisLineFrac = 0.30
  val MinAlphaWordFrac = 0.80
  val MinStopWords = 2L
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def r6(c: Column): Column = round(c, 6)

  def report(docs: DataFrame, idCol: String, textCol: String,
      minWords: Long = MinWords, maxWords: Long = MaxWords,
      minMeanWordLen: Double = MinMeanWordLen,
      maxMeanWordLen: Double = MaxMeanWordLen,
      maxSymbolWordRatio: Double = MaxSymbolWordRatio,
      maxBulletLineFrac: Double = MaxBulletLineFrac,
      maxEllipsisLineFrac: Double = MaxEllipsisLineFrac,
      minAlphaWordFrac: Double = MinAlphaWordFrac,
      minStopWords: Long = MinStopWords,
      stopWords: Seq[String] = StopWords): DataFrame = {
    val base = docs.select(col(idCol),
      col(textCol).as("_txt"),
      split(col(textCol), "\n").as("_ln"),
      Text.tokens(translate(col(textCol), "\n", " ")).as("_tk"))

    val nWords = size(col("_tk")).cast("long")
    val tokChars = aggregate(col("_tk"), lit(0L),
      (a, t) => a + length(t).cast("long"))
    // '#' per-char count; "..." by greedy non-overlapping removal (the
    // deterministic convention both engines share), "…" per-char
    val hashes = (length(col("_txt")) -
      length(translate(col("_txt"), "#", ""))).cast("long")
    val dots3 = ((length(col("_txt")) -
      length(expr("replace(_txt, '...', '')"))) / 3).cast("long")
    val uniEll = (length(col("_txt")) -
      length(translate(col("_txt"), "…", ""))).cast("long")
    val ellipses = dots3 + uniEll

    val nLines = size(col("_ln")).cast("long")
    val bulletLines = size(filter(col("_ln"), l => {
      val t = ltrim(l)
      t.startsWith("• ") || t.startsWith("- ") || t.startsWith("* ")
    })).cast("long")
    val ellLines = size(filter(col("_ln"), l => {
      val t = rtrim(l)
      t.endsWith("...") || t.endsWith("…")
    })).cast("long")

    val alphaWords = size(filter(col("_tk"),
      t => t.rlike("[A-Za-z]"))).cast("long")
    val stopHits = size(array_intersect(
      array_distinct(transform(col("_tk"), t => lower(t))),
      array(stopWords.map(lit(_)): _*))).cast("long")

    def perWord(c: Column): Column =
      when(nWords > 0, r6(c.cast("double") / nWords.cast("double")))
        .otherwise(0.0)
    // same discipline on the line denominators: for non-null text
    // split() yields ≥ 1 element so this can't divide by zero, but a
    // NULL text nulls nLines — the guard lands 0.0 there instead of
    // silently nulling the whole row
    def perLine(c: Column): Column =
      when(nLines > 0, r6(c.cast("double") / nLines.cast("double")))
        .otherwise(0.0)

    base.select(col(idCol),
        coalesce(nWords, lit(0L)).as("n_words"),
        when(nWords > 0, r6(tokChars.cast("double") / nWords.cast("double")))
          .otherwise(0.0).as("mean_word_len"),
        perWord(hashes).as("hash_word_ratio"),
        perWord(ellipses).as("ellipsis_word_ratio"),
        perLine(bulletLines).as("bullet_line_frac"),
        perLine(ellLines).as("ellipsis_line_frac"),
        perWord(alphaWords).as("alpha_word_frac"),
        coalesce(stopHits, lit(0L)).as("stop_hits"))
      .withColumn("pass",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen &&
          col("hash_word_ratio") <= maxSymbolWordRatio &&
          col("ellipsis_word_ratio") <= maxSymbolWordRatio &&
          col("bullet_line_frac") <= maxBulletLineFrac &&
          col("ellipsis_line_frac") <= maxEllipsisLineFrac &&
          col("alpha_word_frac") >= minAlphaWordFrac &&
          col("stop_hits") >= minStopWords)
  }
}
