package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Host-scoped boilerplate line removal: a line is boilerplate when it
  * appears in at least `minDocFrac` of its HOST's documents —
  * navigation menus, footers, cookie banners — and is stripped from
  * every page, keeping each page's unique content. This is the
  * template-removal stage web-corpus pipelines run between HTML
  * cleanup and dedup (CCNet does the paragraph-hash analogue per
  * shard; boilerpipe/trafilatura do it per-page with DOM features);
  * GLOBAL line dedup (q89) cannot express it — "© example.com 2024"
  * must die on example.com's 10k pages yet survive as quoted text
  * elsewhere.
  *
  * 100 TB shape: the line stream shuffles TWICE on slim rows — once
  * keyed by (host, line) to count distinct-doc frequency (the
  * frequency table is distinct-(host,line)-sized, far below the
  * occurrence stream), once keyed by doc to reassemble kept lines.
  * Both keys are uniform (hosts × lines; docs); no window over
  * anything corpus-sized; payload lines travel only to their own
  * count/reassembly task. The doc-frequency ratio is
  * `COUNT(DISTINCT doc)/host_docs` in IEEE, exactly replayable.
  */
object Boilerplate {

  /** Adds `n_lines`, `n_boiler`, `clean_text` (kept lines in original
    * order, '\n'-joined) per input row.
    */
  def stripHostBoilerplate(df: DataFrame, idCol: String, hostCol: String,
      textCol: String, minDocFrac: Double = 0.5): DataFrame = {
    require(minDocFrac > 0 && minDocFrac <= 1,
      s"minDocFrac must be in (0, 1], got $minDocFrac")
    val lines = df.select(col(idCol), col(hostCol),
      posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_line")))
    val hostDocs = df.groupBy(hostCol)
      .agg(countDistinct(col(idCol)).as("_nd"))
    val lineDf = lines.select(col(hostCol), col("_line"), col(idCol))
      .distinct()
      .groupBy(hostCol, "_line").agg(count(lit(1)).as("_df"))
    val boiler: Column =
      col("_df").cast("double") / col("_nd").cast("double") >= minDocFrac
    val kept = lines
      .join(lineDf, Seq(hostCol, "_line"))
      .join(broadcast(hostDocs), Seq(hostCol))
      .withColumn("_boiler", boiler)
    // every doc has >= 1 line, so this group-by covers every input row
    kept.groupBy(idCol, hostCol).agg(
      count(lit(1)).as("n_lines"),
      sum(when(col("_boiler"), 1L).otherwise(0L)).as("n_boiler"),
      array_join(transform(
        array_sort(collect_list(when(!col("_boiler"),
          struct(col("_pos"), col("_line"))))),
        s => s.getField("_line")), "\n").as("clean_text"))
  }

  /** The STORED index a long-lived pipeline keeps between batches:
    * per-(host, line) distinct-doc frequency. Pair with
    * [[hostDocCounts]].
    */
  def lineDfIndex(df: DataFrame, idCol: String, hostCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol), col(hostCol),
        explode(split(col(textCol), "\n")).as("line"))
      .distinct()
      .groupBy(hostCol, "line").agg(count(lit(1)).as("df"))

  /** Per-host distinct-doc counts (the index's denominator side). */
  def hostDocCounts(df: DataFrame, idCol: String, hostCol: String): DataFrame =
    df.groupBy(hostCol).agg(countDistinct(col(idCol)).as("nd"))

  /** INCREMENTAL [[stripHostBoilerplate]]: strip a DELTA batch under
    * the base corpus's stored (host, line) df index + host doc
    * counts, updated with the delta's own contributions — the shape
    * a daily-ingest pipeline runs (the q85/q148 incremental family).
    * History is touched ONLY through the stored index: base text is
    * never re-exploded; everything else is delta-sized. Output ≡
    * from-scratch over base ∪ delta restricted to the delta ids
    * (PRECONDITION: delta doc ids are disjoint from the base's —
    * otherwise df would double-count the overlap).
    */
  def stripIncremental(delta: DataFrame, lineIndex: DataFrame,
      hostDocs: DataFrame, idCol: String, hostCol: String,
      textCol: String, minDocFrac: Double = 0.5): DataFrame = {
    require(minDocFrac > 0 && minDocFrac <= 1,
      s"minDocFrac must be in (0, 1], got $minDocFrac")
    val lines = delta.select(col(idCol), col(hostCol),
      posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_line")))
    val dDf = lines.select(col(hostCol), col("_line"), col(idCol)).distinct()
      .groupBy(hostCol, "_line").agg(count(lit(1)).as("_ddf"))
    val mergedDf = dDf
      .join(lineIndex.select(col(hostCol), col("line").as("_line"),
        col("df").as("_sdf")), Seq(hostCol, "_line"), "left")
      .select(col(hostCol), col("_line"),
        (col("_ddf") + coalesce(col("_sdf"), lit(0L))).as("_df"))
    val mergedNd = delta.groupBy(hostCol)
      .agg(countDistinct(col(idCol)).as("_dnd"))
      .join(hostDocs.select(col(hostCol), col("nd").as("_snd")),
        Seq(hostCol), "left")
      .select(col(hostCol),
        (col("_dnd") + coalesce(col("_snd"), lit(0L))).as("_nd"))
    val kept = lines
      .join(mergedDf, Seq(hostCol, "_line"))
      .join(broadcast(mergedNd), Seq(hostCol))
      .withColumn("_boiler",
        col("_df").cast("double") / col("_nd").cast("double") >= minDocFrac)
    kept.groupBy(idCol, hostCol).agg(
      count(lit(1)).as("n_lines"),
      sum(when(col("_boiler"), 1L).otherwise(0L)).as("n_boiler"),
      array_join(transform(
        array_sort(collect_list(when(!col("_boiler"),
          struct(col("_pos"), col("_line"))))),
        s => s.getField("_line")), "\n").as("clean_text"))
  }
}
