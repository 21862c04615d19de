package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable bottom-k-by-hash summary: keep the `k` pairs with the
  * smallest (hash, id) among everything seen. With a content hash as
  * the key this is a DETERMINISTIC uniform sample of each group — the
  * grouped form of q103's KMV bottom-k (Beyer et al., SIGMOD 2007):
  * a pure function of the group's content, independent of row order,
  * partitioning, and merge tree (the buffer keeps a SORTED ≤k array;
  * merging two buffers re-takes the k smallest — associative and
  * commutative by construction, property-tested).
  *
  * Execution shape at 100 TB: map-side partials — every partition
  * reduces each group to ≤k (hash, id) pairs before the shuffle, so
  * a per-language / per-domain sample of a trillion-row corpus
  * shuffles k·|groups| rows, not the corpus. The classic window
  * formulation (`row_number() OVER (PARTITION BY g ORDER BY h)`)
  * shuffles EVERY row to its group's partition first — the exact
  * per-key-window shape the star-round/substring/df operators
  * eliminated.
  */
case class BottomKByHash(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(b: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    insert(b, in)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    b.foldLeft(a)(insert)

  /** Insert into the SORTED-DISTINCT buffer in O(log k) compares +
    * one O(k) copy (only when the element is actually kept): binary
    * search the insertion point instead of re-sorting and
    * distinct-scanning the whole buffer per accepted row — behavior
    * is unchanged because the buffer invariant is sorted-distinct.
    */
  private def insert(b: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] = {
    val ord = implicitly[Ordering[(Long, Long)]]
    if (b.size >= k && ord.gteq(in, b.last)) b
    else {
      val arr = b.toIndexedSeq
      var lo = 0
      var hi = arr.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.lt(arr(mid), in)) lo = mid + 1 else hi = mid
      }
      if (lo < arr.length && arr(lo) == in) b // already present
      else ((arr.take(lo) :+ in) ++ arr.drop(lo)).take(k)
    }
  }

  override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object BottomK {
  /** Column aggregate over (hash BIGINT, id BIGINT) columns: the k
    * smallest (hash, id) pairs of the group, sorted.
    */
  def bottomK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(BottomKByHash(k),
      ExpressionEncoder[(Long, Long)]())
}
