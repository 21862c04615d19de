package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff: the added / removed / changed / unchanged
  * ledger between two versions of a keyed corpus — what every
  * periodic-crawl pipeline computes before deciding how much
  * downstream work a new snapshot actually triggers (a 0.4% churn
  * re-crawl should not re-run a 100 TB dedup; the incremental
  * operators in [[Dedup]]/[[NearDup]] consume exactly the delta this
  * diff identifies).
  *
  * 100 TB shape: payloads are reduced to a 128-bit content hash AT
  * THE SCAN (the parquet reader projects only id + payload, and the
  * payload dies inside the first Project), so the full-outer join
  * shuffles (id, 32-byte hex) rows — never document bytes. The join
  * is plain hash-partitioned equi-join territory: AQE handles size
  * imbalance between snapshots, and ids are unique per side so there
  * is no skewed key to funnel.
  */
object Snapshot {

  /** Per-id diff status between snapshots `a` (old) and `b` (new):
    * 'added' (only in b), 'removed' (only in a), 'changed' (both,
    * different payload hash), 'unchanged'. One row per id in a ∪ b.
    */
  def diffStatus(a: DataFrame, b: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val ha = a.select(col(idCol).as("_id"), md5(col(payloadCol)).as("_ha"))
    val hb = b.select(col(idCol).as("_id"), md5(col(payloadCol)).as("_hb"))
    ha.join(hb, Seq("_id"), "full_outer")
      .select(col("_id").as(idCol),
        when(col("_ha").isNull, lit("added"))
          .when(col("_hb").isNull, lit("removed"))
          .when(col("_ha") === col("_hb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The diff rolled up to the four status counts plus each status's
    * share of |a ∪ b| — the one-screen churn report. Exact counts;
    * the share is one exact-integer division rounded to 6 dp.
    */
  def diffReport(a: DataFrame, b: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val st = diffStatus(a, b, idCol, payloadCol)
    val total = st.agg(count(lit(1)).as("_total"))
    st.groupBy("status").agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(total))
      .select(col("status"), col("n_docs"),
        round(col("n_docs").cast("double") / col("_total").cast("double"), 6)
          .as("pct"))
      .orderBy("status")
  }
}
