package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequential packing of chunks into fixed-token-budget
  * training sequences — the step after [[Chunker]]: concatenate
  * chunks in order until the next one would overflow the context
  * budget, then start a new sequence. Chunks are never split and
  * never dropped (an overlong chunk gets its own sequence;
  * truncation is the trainer's decision, not the packer's).
  *
  * Packing is INHERENTLY sequential — each placement depends on the
  * running total — so the 100 TB shape is per-SHARD sequential,
  * parallel ACROSS shards (exactly how production packers run):
  * shard = doc_id mod `shards`, one `flatMapGroups` fold per shard
  * (the [[Ewma]] precedent: O(n) per group after one shuffle,
  * parallel over the unbounded shard count). Shard count is the
  * parallelism AND memory lever — a shard's chunk metadata (three
  * longs per chunk, not the text) must fit an executor; at 100 TB
  * raise `shards`, which only adds seam waste at shard boundaries.
  * Determinism: order within a shard is (doc_id, chunk_idx) — layout-
  * independent, so the same corpus packs identically at any
  * parallelism (gate-checked against a recursive-CTE oracle).
  */
object Packer {

  /** Assign each chunk row to (seq_idx, seq_pos) within its shard.
    * Input needs (idCol: long-castable, idxCol, tokCol). Output:
    * (shard, doc_id, chunk_idx, n_tokens, seq_idx, seq_pos).
    */
  def pack(chunks: DataFrame, idCol: String, idxCol: String, tokCol: String,
           budget: Long, shards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    // fail fast on non-integral columns: a string id would cast to
    // NULL (non-ANSI) and surface later as an opaque null-in-
    // non-nullable-field NPE from the Tuple4 encoder at execution
    Seq(idCol, idxCol, tokCol).foreach { c =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val t = chunks.schema(c).dataType
      val integral = t == ByteType || t == ShortType || t == IntegerType || t == LongType
      require(integral,
        s"pack() needs integral columns; '$c' is $t — hash non-numeric ids " +
          "to longs first (e.g. xxhash64(col)) so shard assignment is defined")
    }
    val s = chunks.sparkSession
    import s.implicits._
    chunks.select(
        pmod(col(idCol).cast("long"), lit(shards.toLong)).as("_shard"),
        col(idCol).cast("long").as("_id"),
        col(idxCol).cast("long").as("_idx"),
        col(tokCol).cast("long").as("_n"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        // chunk METADATA only rides into memory (24 bytes/chunk);
        // (doc_id, chunk_idx) sort makes the fold layout-independent
        val rows = it.toArray.sortBy(r => (r._2, r._3))
        var seq = 0L
        var used = 0L
        var pos = 0L
        rows.iterator.map { case (_, id, idx, n) =>
          if (used > 0 && used + n > budget) { seq += 1; used = 0L; pos = 0L }
          used += n
          val p = pos
          pos += 1
          (shard, id, idx, n, seq, p)
        }
      }
      .toDF("shard", "doc_id", "chunk_idx", "n_tokens", "seq_idx", "seq_pos")
  }
}
