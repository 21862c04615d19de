package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.AcExpressions

/** Banned-phrase tagging over a document corpus: the C4-style
  * badwords filter, built on the [[graft.functions.AhoCorasick]]
  * automaton so the whole phrase list costs ONE text scan per row.
  *
  * Matching is case-insensitive (both text and rules fold) with
  * substring semantics — the UT1/C4 list contract; see the kernel
  * scaladoc for the word-boundary caveat ("classification" matches a
  * "class" rule; that is what substring lists specify).
  *
  * 100 TB shape: a pure per-row projection — the automaton is a
  * model-sized plan constant, the scan is O(len + matches)/row
  * independent of list size, no shuffle, whole-stage codegen intact.
  * On a stream the same projection is stateless ingest-time
  * filtering.
  */
object PhraseFilter {

  /** Adds `n_banned` (distinct matched phrases), `banned`, and
    * `phrases` (comma-joined sorted matches, null when clean).
    */
  def tagBanned(df: DataFrame, textCol: String,
      phrases: Seq[String]): DataFrame = {
    val m = AcExpressions.acMatches(lower(col(textCol)),
      phrases.map(_.toLowerCase))
    df.withColumn("_m", m)
      .withColumn("n_banned", size(col("_m")))
      .withColumn("banned", size(col("_m")) > 0)
      .withColumn("phrases",
        when(size(col("_m")) > 0, array_join(col("_m"), ",")))
      .drop("_m")
  }
}
