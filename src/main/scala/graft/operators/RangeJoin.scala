package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the remaining member of the
  * time-join family next to [[AsOfJoin]] (SURVEY.md §2.4 "joins"):
  * for each interval row, every point row with the same keys and
  * `lo <= t <= hi`.
  *
  * A naive `ON p.t BETWEEN i.lo AND i.hi` theta join is a nested loop
  * — O(points × intervals) per key, unusable at 100 TB. Binning makes
  * it an equi-join: each point lands in exactly ONE fixed-width time
  * bin, each interval explodes into the bins it covers (≤ span/width
  * + 1 rows), the join runs hash-partitioned on (keys, bin), and the
  * exact BETWEEN predicate filters the collision set. Shuffle volume
  * is points + interval-bin rows — linear, and each matching pair is
  * emitted exactly once because the point's single bin is the only
  * place the pair can meet. Pick `binWidth` near the typical interval
  * span: wider bins mean fewer interval rows but more false-candidate
  * collisions; narrower the reverse.
  */
object RangeJoin {

  /** @param points    frame with `keys` and numeric `pointTime`
    * @param intervals frame with `keys` and numeric `lo` / `hi`
    *                  (inclusive; rows with hi < lo are dropped)
    * @param binWidth  bin width in `pointTime` units
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointTime: String,
      lo: String,
      hi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("_bin", floor(col(pointTime) / binWidth))
    val iv = intervals
      // guard before sequence(): Spark infers step -1 for hi < lo and
      // would silently fabricate bins for an empty interval
      .filter(col(hi) >= col(lo))
      .withColumn("_bin",
        explode(sequence(floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    p.join(iv, keys :+ "_bin")
      .filter(col(pointTime).between(col(lo), col(hi)))
      .drop("_bin")
  }
}
