package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed Spark `Aggregator` —
  * the mergeable top-frequency sketch (Agarwal et al., "Mergeable
  * Summaries", PODS 2012 §3): at most `capacity` counters; a stream
  * item increments its counter, inserts if a slot is free, or
  * decrements ALL counters otherwise; merging sums two summaries and
  * subtracts the (capacity+1)-th largest count from every counter.
  *
  * Guarantee (any processing/merge order, any parallelism): for every
  * item with true count c over n total items,
  *
  *     c − n/(capacity+1)  ≤  estimate  ≤  c
  *
  * and every item with c > n/(capacity+1) is present in the summary.
  * The ESTIMATES are order-dependent (different partitionings give
  * different values inside the band) — consumers must gate on the
  * bound, not the raw values (q70 does exactly that).
  *
  * Execution shape at 100 TB: Spark runs typed Aggregators as
  * imperative aggregates with map-side partials — each input
  * partition reduces to a ≤`capacity`-entry map before any shuffle,
  * and only model-sized summaries merge. That is the entire point:
  * top-token/domain/url frequency WITHOUT a full-vocabulary groupBy
  * (a token groupBy at corpus scale shuffles |vocab| rows; this
  * shuffles `capacity` rows per partition).
  */
case class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1)
      case None if b.size < capacity => b.updated(tok, 1L)
      case None => b.flatMap { case (k, c) =>
        if (c > 1) Some(k -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (summed.size <= capacity) summed
    else {
      // subtract the (capacity+1)-th largest count from everything —
      // the mergeable-summaries decrement step
      val cut = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
      summed.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object HeavyHitters {
  /** Column aggregate: Misra-Gries summary of a string column. */
  def misraGries(capacity: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(MisraGries(capacity), Encoders.STRING)
}
