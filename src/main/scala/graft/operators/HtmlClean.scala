package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markup normalization: strip HTML/XML tags, decode the common
  * character entities, and collapse whitespace — the first transform
  * any crawl-derived corpus applies (trafilatura/jusText do full DOM
  * extraction; this is the regex tier that handles the residue those
  * extractors leave and the inline markup embedded in code/forum
  * text). No counterpart in the reference ETL; extension-tier scope.
  *
  * Contract, in order (each step sees the previous step's output, so
  * the composition is exactly replayable):
  *  1. tags:     every `<[^>]+>` span is replaced by ONE space (not
  *               removed outright — `a<br>b` must not fuse into `ab`);
  *               `n_tags` counts the spans on the input text.
  *  2. entities: the six high-frequency entities `&lt; &gt; &quot;
  *               &#39; &nbsp; &amp;` decode via literal replace, with
  *               `&amp;` LAST — decoding it earlier would conjure
  *               fresh entities out of double-escaped text
  *               (`&amp;lt;` must yield `&lt;`, not `<`).
  *  3. spacing:  runs of space/tab/newline/CR collapse to one space
  *               (the explicit class `[ \t\n\r]+`, NOT `\s` — Java
  *               and RE2 disagree on `\s`'s membership), then trim.
  *
  * 100 TB shape: pure per-row projection — `regexp_replace`,
  * `replace`, `regexp_count` are all codegen'd Catalyst expressions;
  * no UDF, no shuffle, streams stateless.
  */
object HtmlClean {

  val TagRe = "<[^>]+>"
  private val SpaceRe = "[ \\t\\n\\r]+"

  /** Entity decode order; `&amp;` MUST stay last (see scaladoc). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  def cleanColumn(textCol: Column): Column = {
    val untagged = regexp_replace(textCol, TagRe, " ")
    val decoded = Entities.foldLeft(untagged) { case (c, (ent, ch)) =>
      replace(c, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, SpaceRe, " "))
  }

  /** Adds `n_tags` (tag spans on the raw text) and `clean_text`. */
  def stripMarkup(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tags", regexp_count(col(textCol), lit(TagRe)))
      .withColumn("clean_text", cleanColumn(col(textCol)))
}
