package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Morton (Z-order) keys for multi-dimensional data clustering.
  *
  * A 100 TB warehouse is usually laid out to serve ONE predicate
  * dimension well (date partitions): a `user_id` range query then
  * scans every partition. Sorting files by the bit-interleaved key of
  * two dimensions gives every file a tight bounding box in BOTH — a
  * reader prunes on per-file parquet min/max stats for either
  * predicate (the Delta/Iceberg OPTIMIZE ZORDER technique, public
  * literature: Morton 1966; "Processing a Trillion Rows per Second"-
  * style multi-dim clustering write-ups).
  *
  * The key is pure integer Column arithmetic (shift/mask spreading,
  * the classic magic-number interleave) — whole-stage-codegen'd, no
  * UDF, and reproducible in ANSI SQL for the oracle gate
  * (q72_zorder_cluster; ZOrderSpec asserts the per-file pruning
  * claim).
  */
object ZOrder {

  // spread the low 16 bits of x so bit i lands at position 2i:
  // x = abcd → a0b0c0d0 (per-stage masks are the standard Morton
  // magic numbers, 16→32 bit variant)
  private def spread16(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(0xFFFFL))
    val m1 = (m0.bitwiseOR(shiftleft(m0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val m2 = (m1.bitwiseOR(shiftleft(m1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = (m2.bitwiseOR(shiftleft(m2, 2))).bitwiseAND(lit(0x33333333L))
    (m3.bitwiseOR(shiftleft(m3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key interleaving the low 16 bits of `x` and `y`
    * (x in even bit positions, y in odd). Caller buckets the raw
    * dimensions into [0, 2^16) first — at warehouse scale 65 536
    * buckets per dimension is file-granularity, not row-granularity.
    */
  def mortonKey(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1)).as("z")

  /** Cluster `df` for two-dimensional locality: range-sort by the
    * Morton key of the bucketed dimensions and write with bounded
    * file size. `repartitionByRange` + `sortWithinPartitions` keeps
    * the sort distributed (no single-task global sort); every output
    * file then spans a contiguous z-range, i.e. a tight (x, y)
    * bounding box for parquet min/max pruning on BOTH columns.
    */
  def writeClustered(
      df: DataFrame, x: Column, y: Column, path: String,
      partitions: Int, maxRecordsPerFile: Long): Unit = {
    df.withColumn("_z", mortonKey(x, y))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }
}
