package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic first-wins deduplication (reference O18: `date UNIQUE`
  * + swallowed insert errors, populate_from_json.py:465, 531-535 —
  * duplicate dates in the input are silently dropped, first wins).
  *
  * Spark's `dropDuplicates` keeps an ARBITRARY row per key (whichever
  * partition wins the race), which breaks oracle parity and run-to-run
  * determinism on a cluster. `row_number() = 1` over an explicit
  * tiebreak order is deterministic at any parallelism — one shuffle on
  * the key, same as dropDuplicates would cost.
  */
object Dedup {

  /** Keep exactly one row per `keys`, the first by `order`. */
  def firstWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Exact content dedup by hash (LLM-pipeline): one row per distinct
    * `sha2(contentCol)`, first by `order`. The hash groupBy shuffles on
    * the 64-hex digest — uniformly distributed, so no skew at 100 TB;
    * identical documents land on one reducer regardless of count
    * (pathological mono-duplicate corpora would need a pre-aggregation
    * by (hash, partition) first, which `row_number` here avoids by
    * being a single pass).
    */
  def exactByHash(
      df: DataFrame,
      contentCol: String,
      order: Seq[Column]): DataFrame =
    firstWins(
      df.withColumn("_h", sha2(col(contentCol), 256)),
      Seq("_h"), order).drop("_h")
}
