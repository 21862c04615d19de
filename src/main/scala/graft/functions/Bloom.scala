package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column wrappers over Spark's built-in bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the same
  * machinery Catalyst's InjectRuntimeFilter uses for runtime row
  * pruning, exposed here for explicit pipeline use: a probabilistic
  * "seen" set that pre-filters an exact anti-join).
  *
  * Both sides hash through `xxhash64` to LongType, the aggregate's
  * native element type, so build and probe agree bit-for-bit.
  *
  * `mightContain`'s bloom argument must be a CONSTANT or a SCALAR
  * SUBQUERY (the expression deserializes the filter once per task, so
  * an arbitrary per-row column is rejected at analysis) — pass
  * `seenDigests.agg(bloomFilterAgg(...)).scalar()`.
  */
object Bloom {

  /** Aggregate a column into a serialized bloom filter (BinaryType).
    * `expectedItems`/`numBits` size the bitmap: false-positive rate
    * ≈ (1 − e^(−kn/m))^k; at the 8 bits-per-item default that is
    * ~2% — callers trade bitmap bytes (broadcast cost) against the
    * FP fraction that flows into the exact backstop join.
    */
  def bloomFilterAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(c)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe: true if `c` MIGHT be in the filter (false positives
    * possible, false negatives impossible — "false" rows are
    * definitely unseen and need no exact check).
    */
  def mightContain(bloom: Column, c: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        ColumnBridge.expression(bloom),
        ColumnBridge.expression(xxhash64(c))))
}
