package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.OpCache.TrackedPersist

/** Token-budget corpus selection WITHOUT a global sort: "take the
  * best documents until the token budget is spent" — the final
  * data-selection stage of every pretraining pipeline (the greedy
  * form of quality-threshold selection; cf. DSIR/classifier-ranked
  * selection, Xie NeurIPS'23, Brown et al. 2020 App. A) — with the
  * semantics of ORDER BY (quality DESC, id ASC) prefix-while-budget,
  * but NO corpus-sized sort or window anywhere:
  *
  *  1. QUALITY CLASSES: quality is a 6-dp grid value, so the
  *     per-quality rollup (Σ tokens) is MODEL-SIZED (≤ 10⁶+1 rows by
  *     construction); its running sum is a window over that model
  *     table only. Classes whose cumulative tokens fit are selected
  *     wholesale by a broadcast semi-join.
  *  2. BOUNDARY CLASS, ID BUCKETS: the one partially-fitting class
  *     refines by `id div bucketWidth` — each bucket covers ≤
  *     `bucketWidth` CONSECUTIVE ids, so it holds ≤ `bucketWidth`
  *     docs; the bucket rollup's running sum is again a bounded-table
  *     window, and fully-fitting buckets select by broadcast join.
  *  3. BOUNDARY BUCKET: ≤ `bucketWidth` rows BY CONSTRUCTION — the
  *     only per-doc running sum runs over that bounded frame.
  *
  * At 100 TB: pass 1 shuffles one row per doc into the class rollup
  * (map-side combinable); the boundary class can be arbitrarily
  * large (every doc with the same 6-dp score) and is never sorted —
  * the bucket level bounds every task at `bucketWidth` rows. If the
  * bucket TABLE itself outgrows the driver-comfortable range, add a
  * level (the refinement recurses in log_bucketWidth(idRange)
  * passes); one level covers id ranges to ~4096 × 10⁶ at the
  * default.
  *
  * Equivalence contract (the oracle's form): selected ids ≡ the
  * prefix of ORDER BY (quality DESC, `idCol` ASC) with running token
  * sum ≤ budget. Exact: everything is integer token arithmetic on a
  * 6-dp-grid quality key.
  */
object BudgetSelect {

  /** (`idCol`, quality, n_tokens) of the selected documents.
    * `qualityCol` must be a 6-dp-grid value (the [[graft.functions
    * .Text.qualityScore]] contract); `tokenCol` an exact BIGINT.
    */
  def selectByQuality(
      df: DataFrame,
      idCol: String,
      qualityCol: String,
      tokenCol: String,
      budgetTokens: Long,
      bucketWidth: Long = 4096L): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val per = df.select(col(idCol).cast("long").as("_id"),
        col(qualityCol).as("_q"), col(tokenCol).cast("long").as("_n"))
      .persistTracked

    // 1. model-sized class table + running sum (6-dp grid bounds it)
    val cls = per.groupBy("_q").agg(sum(col("_n")).as("_ct"))
      .withColumn("_cum", sum(col("_ct")).over(Window.orderBy(col("_q").desc)))
    val fullCls = cls.filter(col("_cum") <= budgetTokens).select("_q")
    val bnd = cls.filter(col("_cum") > budgetTokens &&
        col("_cum") - col("_ct") <= budgetTokens)
      .select(col("_q").as("_bq"), (lit(budgetTokens) - (col("_cum") - col("_ct"))).as("_r"))

    val selFull = per.join(broadcast(fullCls), per("_q") === fullCls("_q"), "left_semi")

    // 2. boundary class → consecutive-id buckets (each ≤ bucketWidth docs)
    val bdocs = per.join(broadcast(bnd), per("_q") === bnd("_bq"))
      .select(col("_id"), col("_q"), col("_n"), col("_r"))
    val bkt = bdocs.groupBy(expr(s"_id div ${bucketWidth}L").as("_bk"), col("_r"))
      .agg(sum(col("_n")).as("_bt"))
      .withColumn("_bcum", sum(col("_bt")).over(Window.orderBy(col("_bk"))))
    val fullBkt = bkt.filter(col("_bcum") <= col("_r")).select("_bk")
    val bndBkt = bkt.filter(col("_bcum") > col("_r") &&
        col("_bcum") - col("_bt") <= col("_r"))
      .select(col("_bk").as("_bbk"), (col("_r") - (col("_bcum") - col("_bt"))).as("_r2"))

    val selBkt = bdocs.join(broadcast(fullBkt),
      expr(s"_id div ${bucketWidth}L") === fullBkt("_bk"), "left_semi")

    // 3. the one boundary bucket: ≤ bucketWidth rows by construction —
    // the only per-doc running sum, over that bounded frame
    val bb = bdocs.join(broadcast(bndBkt),
      expr(s"_id div ${bucketWidth}L") === bndBkt("_bbk"))
    val selBb = bb
      .withColumn("_dcum", sum(col("_n")).over(
        Window.partitionBy(col("_bbk")).orderBy(col("_id"))))
      .filter(col("_dcum") <= col("_r2"))
      .select("_id", "_q", "_n")

    selFull.select("_id", "_q", "_n")
      .unionByName(selBkt.select("_id", "_q", "_n"))
      .unionByName(selBb)
      .select(col("_id").as(idCol), col("_q").as("quality"), col("_n").as("n_tokens"))
  }
}
