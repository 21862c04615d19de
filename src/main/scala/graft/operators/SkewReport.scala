package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shuffle-skew diagnosis: the per-key frequency profile an engineer
  * reads before a big join or aggregation ships — which keys are
  * hot, how hot relative to the mean, and what salt factor
  * ([[Salt]]) would level them. The report IS the decision input for
  * the degree-split / salting machinery used across this repo
  * (Dedup's hot-degree broadcast split, Salt's two-phase spray): run
  * it on the join key, read `suggested_salt`, act.
  *
  * Everything is exact-integer except two final ratio divisions
  * (rounded 6 dp), so the whole report rides the hash gate.
  *
  * 100 TB shape: the key histogram is one map-side-combinable
  * groupBy (shuffle ∝ distinct keys). The percentile does NOT sort
  * the key table: it runs on the frequency-of-frequencies table
  * (distinct count values — hundreds of rows for any real
  * distribution), where a single-partition cumulative window is
  * model-sized by construction. Top keys are TakeOrdered.
  */
object SkewReport {

  /** Per-key profile of `keyCol`: the `topN` heaviest keys, each with
    * its count, corpus share, and the salt factor that would cap it
    * at `targetRowsPerKey` rows per salted sub-key — beside the
    * distribution-level columns (n_keys, total_rows, max_cnt,
    * p99_cnt, skew_factor = max/mean) broadcast onto every row.
    *
    * p99_cnt is the exact empirical 99th percentile of rows-per-key:
    * the smallest count c such that at least ⌈0.99·n_keys⌉ keys have
    * count ≤ c.
    */
  def keyProfile(df: DataFrame, keyCol: String, topN: Int,
      targetRowsPerKey: Long): DataFrame = {
    require(topN >= 1 && targetRowsPerKey >= 1,
      s"topN and targetRowsPerKey must be >= 1, got $topN / $targetRowsPerKey")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))

    // distribution stats: one mergeable aggregate over the key table
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total_rows"),
      max(col("cnt")).as("max_cnt"))

    // exact p99 via the frequency-of-frequencies table (tiny): the
    // smallest cnt whose ascending cumulative key-count reaches
    // ceil(0.99 * n_keys)
    val ff = counts.groupBy("cnt").agg(count(lit(1)).as("_nk"))
      .withColumn("_cum",
        sum(col("_nk")).over(Window.orderBy("cnt")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val p99 = ff.crossJoin(broadcast(stats.select(col("n_keys").as("_n"))))
      .filter(col("_cum") * 100L >= col("_n") * 99L)
      .agg(min(col("cnt")).as("p99_cnt"))

    val top = counts.orderBy(col("cnt").desc, col("key")).limit(topN)
    top
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(p99))
      .select(col("key"), col("cnt"),
        round(col("cnt").cast("double") / col("total_rows").cast("double"), 6)
          .as("share"),
        expr(s"(cnt + $targetRowsPerKey - 1) div $targetRowsPerKey")
          .as("suggested_salt"),
        col("n_keys"), col("total_rows"), col("max_cnt"), col("p99_cnt"),
        round(col("max_cnt").cast("double") * col("n_keys").cast("double")
          / col("total_rows").cast("double"), 6).as("skew_factor"))
      .orderBy(col("cnt").desc, col("key"))
  }
}
