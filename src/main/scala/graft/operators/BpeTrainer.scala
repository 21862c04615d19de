package graft.operators

import graft.core.OpCache
import graft.core.OpCache.TrackedPersist
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE tokenizer training (Sennrich, Haddow & Birch,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016 — the `learn_bpe` algorithm): iteratively merge the most
  * frequent adjacent symbol pair, starting from characters.
  *
  * The classic formulation is driver-bound (a dict of word
  * frequencies mutated in place). The Spark-first shape:
  *
  *  - the corpus collapses ONCE to the distinct-word frequency table
  *    (`groupBy(word).count` — the only corpus-sized shuffle; BPE
  *    statistics are a pure function of that table, Sennrich §3.2);
  *  - each merge round is (a) a pair-count `groupBy` over the word
  *    table with map-side partials, (b) a 1-ROW argmax collect (the
  *    model update — count DESC, then (left, right) lexicographic,
  *    so ties are deterministic), and (c) a NARROW `aggregate` HOF
  *    fold rewriting each word's symbol array in place — no shuffle,
  *    no driver data;
  *  - the fold is the greedy left-to-right non-overlapping scan of
  *    the reference algorithm: append, or coalesce the just-appended
  *    `left` with the current `right`. A merged token `left+right`
  *    can never cascade within the round (it would have to equal
  *    `left`, impossible for non-empty `right`), which is exactly
  *    the reference's single-pass `re.sub` semantics.
  *
  * Pair STATISTICS count overlapping occurrences (`aaa` contributes
  * 2 to (a,a)) — faithful to the reference's `get_stats`; the MERGE
  * application is non-overlapping greedy. No end-of-word marker is
  * appended (the marker-free BPE variant); add one upstream by
  * suffixing words if cross-word-boundary merges must be blocked.
  *
  * Every value is exact integer arithmetic on deterministic
  * groupings, so the learned merge table is bit-identical across
  * partitionings and replayable in ANSI SQL — q99 gates all ranks
  * against a DuckDB unroll of the same recurrence.
  *
  * Execution shape at 100 TB: corpus → word table is one shuffle of
  * |distinct words| rows (tens of millions, not the corpus);
  * after that every round touches only the word table. Rounds are
  * eagerly checkpointed every `checkpointEvery` merges (the fold
  * chain is narrow but K-deep lineage would stack K codegen stages
  * and recompute from the last materialization on failure), freeing
  * the previous checkpoint as soon as the next lands
  * ([[Dedup.componentsStar]]'s lifecycle discipline). For production
  * vocab sizes (32k merges), per-round argmax latency — one tiny job
  * per merge — dominates; this operator is the exact trainer, and
  * its per-round cost is O(|word table|) with no corpus rescans.
  */
object BpeTrainer {

  /** See [[OpCache.checkpointRdd]] — the shared fail-loud helper. */
  private def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    Some(OpCache.checkpointRdd(df))

  /** One greedy merge pass over a symbol array: the reference
    * algorithm's left-to-right non-overlapping rewrite as a fold.
    */
  private def applyMerge(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          try_element_at(acc, lit(-1)) === lit(left) && x === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** Segment a word with an already-learned merge list (inference):
    * the merges applied in rank order as nested folds. Declarative
    * and codegen'd — right for moderate merge counts (feature
    * hashing, probing, tests); a 32k-merge production segmenter
    * belongs in a linear-scan kernel, not a 32k-deep expression.
    */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(split(word, "")) { case (syms, (l, r)) => applyMerge(syms, l, r) }

  /** Learn `numMerges` BPE merges from `docs(textCol)` (whitespace
    * pre-tokenization, character alphabet). Returns the model as a
    * DataFrame: (rank INT starting at 1, left, right, freq BIGINT =
    * the pair count that won the round). Stops early if no pair
    * remains.
    */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      checkpointEvery: Int = 4,
      reliableCheckpoint: Boolean = false): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    val spark = docs.sparkSession
    graft.core.Exact.requireAnsi(spark, "BpeTrainer.train")
    def cp(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(true) else df.localCheckpoint(true)

    var words = cp(docs
      .select(explode(graft.functions.Text.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), split(col("w"), "").as("syms")))
    var prevCp = checkpointRdd(words)
    var sinceCp = 0

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // overlapping adjacent pairs weighted by word frequency —
      // map-side partial agg; the argmax row is the ONLY driver data
      val best = words
        .select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val Row(l: String, r: String, cnt: Long) = best(0)
        merges += ((rank, l, r, cnt))
        val nextPlan = words.withColumn("syms", applyMerge(col("syms"), l, r))
        sinceCp += 1
        if (sinceCp >= checkpointEvery || rank == numMerges) {
          val next = cp(nextPlan)
          prevCp.foreach(OpCache.freeRdd(_))
          prevCp = checkpointRdd(next)
          words = next
          sinceCp = 0
        } else words = nextPlan
        rank += 1
      }
    }
    // the word table is training state, not the result — the model
    // is driver-sized by construction (numMerges rows). Free it now.
    prevCp.foreach(OpCache.freeRdd(_))

    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.toSeq.map { case (k, l, r, c) => Row(k, l, r, c) }, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("freq", LongType, nullable = false))))
  }
}
