package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal (CCNet / RefinedWeb style): drop
  * every line whose DOCUMENT frequency across the corpus exceeds
  * `maxDf`, then reassemble each document from its surviving lines in
  * original order. Navigation chrome, cookie banners, copyright
  * footers and subscribe prompts repeat across thousands of pages of
  * a crawl; removing them BEFORE near-dup detection both cleans the
  * text and kills the classic false-positive near-dup clusters that
  * boilerplate creates.
  *
  * 100 TB shape, stage by stage:
  *  - document frequency runs on 8-BYTE LINE HASHES, never line text:
  *    the per-doc distinct is a shuffle of (id, hash) metadata rows,
  *    and the df groupBy on the hash is map-side combinable — a
  *    boilerplate hash reduces to one partial row per input partition
  *    instead of funneling every occurrence to one task (the
  *    [[Dedup.substringWindowPairs]] df-cap argument). Hash collisions
  *    (an innocent line sharing a boilerplate hash) cost one wrongly
  *    dropped line with P ≈ (#distinct lines)²/2⁶⁵ — the same accepted
  *    trade as every 8-byte-key join in this engine.
  *  - the hot set (df > maxDf) is boilerplate-sized, orders of
  *    magnitude smaller than the corpus — the anti-join back
  *    broadcasts it map-side.
  *  - reassembly is the ONE unavoidable shuffle of line text: group by
  *    doc, sort surviving lines by original position, join with the
  *    line separator. `collect_list` order is partition-dependent, so
  *    the (pos, line) structs are `array_sort`ed before joining —
  *    deterministic at any parallelism.
  *
  * Documents whose every line is boilerplate survive as EMPTY text
  * (n_kept = 0) rather than vanishing — downstream length filters
  * ([[QualityCascade]]) decide their fate explicitly.
  */
object LineDedup {

  /** Returns one row per input document: (`idCol`, n_kept, n_removed,
    * cleaned) where `cleaned` is the newline-joined surviving lines.
    */
  def removeBoilerplate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDf: Long,
      sep: String = "\n"): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val lines = df.select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("_pos", "_line")))
      .withColumn("_lh", xxhash64(col("_line")))
    // df = distinct documents containing the line: two-stage distinct
    // + count so the hot key pre-aggregates map-side (count_distinct
    // would Expand-explode instead)
    val hot = lines.select(col(idCol), col("_lh")).distinct()
      .groupBy("_lh").agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxDf)
      .select("_lh")
    val kept = lines.join(hot, Seq("_lh"), "left_anti")
    val reassembled = kept.groupBy(idCol).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("_pos"), col("_line")))),
          x => x.getField("_line")),
        sep).as("cleaned"))
    val total = lines.groupBy(idCol).agg(count(lit(1)).as("_n_total"))
    df.select(col(idCol)).join(total, Seq(idCol))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("_n_total") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }
}
