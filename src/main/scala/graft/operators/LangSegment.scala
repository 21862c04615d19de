package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Mixed-language document segmentation: per-LINE language ID, then
  * contiguous same-language runs become spans — the CCNet-style
  * "split the page by paragraph language" step (Wenzek LREC 2020 §3:
  * language ID runs per paragraph precisely because web pages mix
  * languages; a doc-level label throws away the minority-language
  * content this operator recovers).
  *
  * 100 TB shape: line explode is map-side; the run-detection windows
  * partition by DOCUMENT and are bounded by document length — the
  * one window shape the engine permits (never corpus-sized keys);
  * span reassembly shuffles each doc's lines once, same budget as
  * q170. Language ID is PLUGGABLE via `scorer` (line → language-code
  * Column): the default is the [[graft.functions.Text.langId]] marker
  * argmax; pass [[graft.functions.LangNbExpressions.langNbId]] with a
  * fitted [[graft.functions.LangNbModel]] for the trained classifier
  * — both are map-side and exactly SQL-replayable.
  *
  * Output: (idCol, span_idx, lang, n_lines, span_text).
  */
object LangSegment {

  def segments(df: DataFrame, idCol: String, textCol: String,
      scorer: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        Text.langId): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_line")))
    val tagged = lines.withColumn("_lang", scorer(col("_line")))
    val w = Window.partitionBy(idCol).orderBy("_pos")
    val flagged = tagged.withColumn("_new",
      when(lag(col("_lang"), 1).over(w) === col("_lang"), 0).otherwise(1))
    val runs = flagged.withColumn("span_idx",
      (sum(col("_new")).over(w) - 1).cast("long"))
    runs.groupBy(idCol, "span_idx").agg(
      min(col("_lang")).as("lang"), // constant within a span
      count(lit(1)).as("n_lines"),
      array_join(transform(
        array_sort(collect_list(struct(col("_pos"), col("_line")))),
        s => s.getField("_line")), "\n").as("span_text"))
  }
}
