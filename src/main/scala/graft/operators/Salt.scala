package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot aggregation keys.
  *
  * At 100 TB a handful of keys (the 'All' cube cells, a viral
  * document's hash, an empty-string equipment) can dwarf every other
  * group and pin one reducer. AQE's skew-join split handles JOIN skew;
  * for AGGREGATION skew the standard fix is salting: spray each key
  * across `factor` sub-keys, partially aggregate, then merge.
  *
  * Only ALGEBRAIC aggregates (sum / count / min / max / bool-or — all
  * of the engine's AggMethods after the weighted-mean num/den
  * decomposition) can two-phase like this.
  */
object Salt {

  /** Two-phase salted aggregation: `aggs` must be mergeable by the
    * SAME expression (true for sum/count-as-sum/min/max). Each agg is
    * (inputExpr → partial alias, mergeExpr over that alias).
    */
  /** @param sprayCols columns the deterministic salt hashes. Default
    *                   (empty) = every column — correct but it defeats
    *                   column pruning: the scan then reads the WHOLE
    *                   table for an aggregate that needs two columns.
    *                   Callers should pass a unique id or the key+value
    *                   columns so the scan stays pruned.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      factor: Int,
      partial: Seq[(Column, String)],
      merge: Seq[(String, Column)],
      sprayCols: Seq[String] = Nil): DataFrame = {

    // deterministic spray: hash modulo factor (a rand() salt would
    // break retry/replay determinism)
    val sc = if (sprayCols.nonEmpty) sprayCols else df.columns.toSeq
    val salted = df.withColumn("_salt",
      pmod(hash(sc.map(col): _*), lit(factor)))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head._1.as(partial.head._2),
        partial.tail.map { case (c, n) => c.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head._2.as(merge.head._1),
        merge.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Salted exact sum — the common case. The partial stays DECIMAL
    * between the phases (casting back to double per sub-key would
    * round each partial and drift from the single-phase sum by ulps);
    * the merged result is bit-identical to `Exact.dsum` over the
    * unsalted frame at any spray factor.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      factor: Int = 16, sprayCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    saltedAgg(df, keys, factor,
      partial = Seq(sum(col(valueCol).cast(DecimalType(38, 6))) -> "_p"),
      merge = Seq(valueCol -> sum(col("_p")).cast(DoubleType)),
      sprayCols = sprayCols)
  }
}
