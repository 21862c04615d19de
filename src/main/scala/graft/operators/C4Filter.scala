package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4 LINE-LEVEL cleaning rules (Raffel et al., "Exploring the Limits
  * of Transfer Learning with a Unified Text-to-Text Transformer",
  * JMLR 2020, §2.2 — the C4 corpus construction): the canonical
  * line-discipline filters that sit BESIDE the block-level
  * [[MainContent]] extraction and the document-level [[GopherQuality]]
  * thresholds in a web-corpus pipeline:
  *
  *  - keep only lines that END IN TERMINAL PUNCTUATION (`.` `!` `?`
  *    or a closing double quote right after one — trailing
  *    whitespace ignored);
  *  - keep only lines with ≥ `minLineWords` words (C4 used 5);
  *  - drop any line containing the word "javascript" (case-folded
  *    substring, C4's boilerplate-warning heuristic);
  *  - DROP THE WHOLE PAGE when: fewer than `minSentences` sentences
  *    survive (C4 used 3; here a sentence = one terminal-punctuation
  *    mark in the KEPT text — C4 used a sentence splitter, this
  *    deterministic count is the documented simplification), or the
  *    page contains "lorem ipsum" (case-folded), or the page contains
  *    a curly brace `{` (code marker). (C4's badwords page rule is
  *    [[PhraseFilter]] — compose q164 in front.)
  *
  * Output: one row per input doc — `kept_text` (surviving lines
  * joined by `\n`, "" when none), `n_lines_kept`, `n_sentences`,
  * `keep_doc`, and `drop_reason` ("" | "too_few_sentences" |
  * "lorem_ipsum" | "curly_brace" — first matching in that order,
  * page-content rules checked on the RAW text per the paper).
  *
  * 100 TB shape: a pure per-row projection of higher-order functions
  * over the doc's own lines — zero exchanges, O(page)/row, identical
  * code for batch and streaming (the q199/q204/q211 discipline); a
  * NULL page yields zero kept lines and `keep_doc = false`.
  */
object C4Filter {

  val DefaultMinLineWords = 5
  val DefaultMinSentences = 3

  private def keptLines(text: Column, minLineWords: Int): Column = {
    val lines = split(coalesce(text, lit("")), "\n")
    filter(lines, l => {
      val t = rtrim(l)
      val terminal = t.endsWith(".") || t.endsWith("!") || t.endsWith("?") ||
        t.endsWith(".\"") || t.endsWith("!\"") || t.endsWith("?\"")
      val words = size(filter(split(trim(l), " "), w => length(w) > 0))
      terminal && words >= minLineWords &&
        !contains(lower(l), lit("javascript"))
    })
  }

  def clean(docs: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = DefaultMinLineWords,
      minSentences: Int = DefaultMinSentences): DataFrame = {
    val staged = docs.select(col(idCol),
      coalesce(col(textCol), lit("")).as("_txt"),
      keptLines(col(textCol), minLineWords).as("_kl"))
    val kept = array_join(col("_kl"), "\n")
    // sentences = terminal marks in the kept text (deterministic
    // count, not a splitter — see scaladoc)
    val nSent = (length(kept) -
      length(translate(kept, ".!?", ""))).cast("long")
    val lowerTxt = lower(col("_txt"))
    staged.select(col(idCol),
        kept.as("kept_text"),
        size(col("_kl")).cast("long").as("n_lines_kept"),
        nSent.as("n_sentences"),
        when(nSent < minSentences, "too_few_sentences")
          .when(contains(lowerTxt, lit("lorem ipsum")), "lorem_ipsum")
          .when(contains(col("_txt"), lit("{")), "curly_brace")
          .otherwise("").as("drop_reason"))
      .withColumn("keep_doc", col("drop_reason") === "")
      .select(col(idCol), col("kept_text"), col("n_lines_kept"),
        col("n_sentences"), col("keep_doc"), col("drop_reason"))
  }
}
