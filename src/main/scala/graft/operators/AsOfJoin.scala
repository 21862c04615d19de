package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the most recent right row
  * with `rightTime <= leftTime` in the same key group — the join shape
  * behind the reference's interpolation alignment (SURVEY.md §2.4:
  * "interpolation ≈ as-of join") and a staple of event/feature
  * alignment in training-data pipelines.
  *
  * Implementation is the union-and-sweep trick, NOT a range join:
  * tag both sides, union, and run one `last(value, ignoreNulls)`
  * window over (key, time, side) — the matched value sweeps forward to
  * every left row. Cost: ONE shuffle + sort on (keys, time), linear in
  * rows; a naive `l JOIN r ON l.t >= r.t` range join is O(n·m) per key
  * and explodes before filtering to the max — unusable at 100 TB,
  * while the sweep scales like any other window.
  *
  * Ties (`leftTime == rightTime`) match, as in DuckDB/pandas
  * `ASOF JOIN` (right row sorts before left rows at equal time).
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry onto left rows
    *                  (null where no right row precedes the left row)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): DataFrame = {

    val leftCols = left.columns
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select((keys.map(col) :+ col("_t") :+ col("_side")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select((keys.map(col) :+ col("_t") :+ col("_side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col): _*)

    // `_tb` freezes the right row's values as a struct BEFORE the sweep
    // rewrites the columns: when two right rows share (key, _t), the
    // window order alone would let `last` pick a partition-order-
    // dependent winner. Ordering additionally on the value struct makes
    // the winner (the max by field order) deterministic at any
    // parallelism, and every value column is swept from the SAME
    // winning row. Left rows carry an all-null struct — they only tie
    // with each other and read identical window states, so their
    // mutual order is irrelevant.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val unioned = l.unionByName(r)
      .withColumn("_tb", struct(valueCols.map(col): _*))
    val swept = valueCols.foldLeft(unioned) { (acc, c) =>
      acc.withColumn(c, last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    swept.filter(col("_side") === 1).drop("_t", "_side", "_tb")
  }
}
