package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered quality-filter cascade with first-failure attribution — the
  * C4/Gopher-style curation recipe shape: a document is kept only if
  * it passes EVERY rule, and a dropped document is attributed to the
  * FIRST rule it failed (rules are ordered by the pipeline author,
  * cheapest or most-fundamental first). Attribution is what makes a
  * 100 TB curation run debuggable: "we dropped 31% — 24 points of
  * that is the language filter, 5 the stopword floor" is the report
  * every corpus iteration starts from.
  *
  * 100 TB shape: [[annotate]] is a single map-side projection — the
  * rule predicates fold into ONE when-chain over the row, no joins, no
  * shuffle, codegen-friendly (rule inputs reuse the shared
  * `graft_tokens` subtree under whole-stage CSE, so adding a rule does
  * not re-tokenize). [[report]] is one partial-aggregated groupBy over
  * the (few) rule names — the map side emits one partial row per
  * (partition, verdict), never a per-doc shuffle.
  */
object QualityCascade {

  /** Attach `verdict` to each row: "pass", or the name of the first
    * rule (in list order) whose predicate is false. Rule predicates
    * must be deterministic per-row expressions.
    */
  def annotate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "cascade needs at least one rule")
    require(rules.map(_._1).distinct == rules.map(_._1),
      s"duplicate rule names: ${rules.map(_._1)}")
    val verdict = rules.foldRight(lit("pass")) {
      case ((name, passes), els) => when(!passes, lit(name)).otherwise(els)
    }
    df.withColumn("verdict", verdict)
  }

  /** Per-verdict document counts (kept + first-failure attribution per
    * rule), with share of corpus. ONE scan: the total comes from a
    * window over the already-aggregated per-verdict counts (a handful
    * of rows in one partition), not a second pass over the corpus.
    */
  def report(annotated: DataFrame): DataFrame = {
    val counts = annotated.groupBy("verdict").agg(count(lit(1)).as("docs"))
    counts
      .withColumn("_total",
        sum(col("docs")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))))
      .select(col("verdict"), col("docs"),
        round(col("docs").cast("double") / col("_total").cast("double"), 6)
          .as("share"))
  }
}
