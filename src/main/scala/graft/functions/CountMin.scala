package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, concat, element_at, least, lit, pmod, raise_error, size, when, xxhash64}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch as a typed Spark `Aggregator` — the mergeable
  * frequency sketch (Cormode & Muthukrishnan, "An Improved Data
  * Stream Summary: The Count-Min Sketch and its Applications",
  * J. Algorithms 2005): a `depth × width` counter matrix; an item
  * increments one counter per row at `hash_i(item) mod width`; the
  * point estimate is the MIN over the `depth` counters. Merging two
  * sketches is element-wise addition — exactly mergeable, any order.
  *
  * Guarantee: `count(x) ≤ estimate(x)` always (counters only ever
  * add), and `estimate(x) ≤ count(x) + ε·N` with probability
  * `1 − (1/e)^depth` where `ε = e/width` and N is the total item
  * count. Unlike Misra-Gries ([[MisraGries]], which answers "what are
  * the heavy items"), count-min answers point queries for ARBITRARY
  * items after the fact — the two are complementary corpus-profiling
  * sketches.
  *
  * Hash chain: row `i` uses `xxhash64(lit(i), item)` — the BUILT-IN
  * Spark expression chain (seed 42, fold int then string), via the
  * same [[XxHash64Function]] the `xxhash64(...)` SQL function runs.
  * That makes the sketch queryable DECLARATIVELY: [[CountMin.estimate]]
  * computes the same row indices with `pmod(xxhash64(lit(i), item), width)`
  * in pure codegen'd SQL, so probing N keys against a broadcast
  * sketch is a map-side projection — no driver lookup, no UDF.
  *
  * Execution shape at 100 TB: map-side partials — every input
  * partition folds into one `depth × width` long matrix (a few KB)
  * before any shuffle; only matrices merge. Token-frequency point
  * queries over a 100 TB corpus cost one scan plus a model-sized
  * all-to-one merge, versus a |vocab|-row shuffle for the exact
  * groupBy.
  */
case class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Seq[Seq[Long]]] {
  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 2, s"width must be >= 2, got $width")

  /** Matches `xxhash64(lit(row), item)`: seed 42, fold int row index
    * then the item string — bit-identical to the SQL probe side.
    */
  @inline private def rowIndex(row: Int, item: UTF8String): Int = {
    val h = XxHash64Function.hash(item, StringType,
      XxHash64Function.hash(row, IntegerType, 42L))
    java.lang.Math.floorMod(h, width.toLong).toInt
  }

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], item: String): Array[Long] = {
    // SQL aggregate semantics: NULL inputs are skipped, not counted
    // (and UTF8String.fromString would NPE) — nullable columns are fine
    if (item == null) return b
    val u = UTF8String.fromString(item)
    var i = 0
    while (i < depth) {
      b(i * width + rowIndex(i, u)) += 1L
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Seq[Seq[Long]] =
    (0 until depth).map(i => (0 until width).map(j => b(i * width + j)))

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Seq[Long]]] =
    ExpressionEncoder[Seq[Seq[Long]]]()
}

object CountMin {
  /** Column aggregate: count-min sketch of a string column, as a
    * `depth`-element array of `width`-element count rows.
    */
  def countMin(depth: Int, width: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(CountMinSketch(depth, width), Encoders.STRING)

  /** Declarative point query: min over the depth rows of
    * `sketch[i][xxhash64(i, item) mod width]` — pure built-in
    * expressions (codegen'd), bit-identical to the aggregator's
    * update path. `sketch` is typically a broadcast one-row frame.
    *
    * `(depth, width)` MUST match the values the sketch was built with
    * — a mismatched probe would silently return garbage (wrong row
    * indices into a differently-shaped matrix), so the generated
    * expression asserts the sketch's actual shape and raises at the
    * first probed row on mismatch. The guard is two `size()` calls on
    * a (typically broadcast) literal — free next to the hash chain.
    */
  def estimate(sketch: Column, item: Column, depth: Int, width: Int): Column = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val perRow = (0 until depth).map { i =>
      // element_at is 1-based; pmod keeps the index in [0, width)
      element_at(element_at(sketch, i + 1),
        (pmod(xxhash64(lit(i), item), lit(width.toLong)) + 1).cast("int"))
    }
    val est = if (perRow.size == 1) perRow.head else least(perRow: _*)
    when(size(sketch) === lit(depth) &&
        size(element_at(sketch, 1)) === lit(width), est)
      .otherwise(raise_error(concat(
        lit(s"CountMin.estimate: probe shape (depth=$depth, width=$width) does " +
          "not match the sketch's actual ("),
        size(sketch).cast("string"), lit(", "),
        size(element_at(sketch, 1)).cast("string"),
        lit(") — (depth, width) must equal the builder's"))))
  }
}
