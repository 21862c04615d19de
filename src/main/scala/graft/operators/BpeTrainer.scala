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
  * per merge — dominates the all-distributed loop; [[trainHybrid]] is
  * the production escape hatch: distributed corpus collapse + k
  * distributed rounds, then one model-sized collect and driver-local
  * incremental-stats rounds, bit-identical by construction.
  */
object BpeTrainer {

  /** See [[OpCache.checkpointRdd]] — the shared fail-loud helper. */
  private def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    Some(OpCache.checkpointRdd(df))

  /** Spark's string ordering for the tie-break, exactly:
    * `UTF8String.compareTo` is an unsigned byte comparison of the
    * UTF-8 encoding, which differs from `String.compareTo` (UTF-16
    * code units) for supplementary characters vs high-BMP ones — a
    * driver-local round using Java ordering would pick a different
    * merge on such ties and silently diverge from the distributed
    * argmax.
    */
  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** The fold's greedy left-to-right non-overlapping rewrite, as a
    * scalar loop (semantics identical to [[applyMerge]] — the hybrid
    * property test locks the equivalence through full trainings).
    */
  private def applyMergeLocal(s: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      val x = s(i)
      if (out.nonEmpty && out(out.length - 1) == l && x == r)
        out(out.length - 1) = l + r
      else out += x
      i += 1
    }
    out.toArray
  }

  /** Driver-local merge rounds over the collected word table with
    * Sennrich-style INCREMENTAL statistics: global overlapping pair
    * counts plus a pair → candidate-word index; each round rescores
    * only the words that (might) contain the winning pair —
    * subtracting their old adjacent pairs and adding the rewritten
    * ones keeps every count exactly equal to a full recount, so the
    * argmax sequence is bit-identical to the distributed rounds'.
    */
  private def localRounds(
      freqs: Array[Long],
      syms: Array[Array[String]],
      startRank: Int,
      numMerges: Int,
      merges: scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]): Unit = {
    val counts = new java.util.HashMap[(String, String), Long]()
    val where = new java.util.HashMap[(String, String), java.util.BitSet]()
    @inline def bump(p: (String, String), d: Long): Unit = {
      val c = counts.getOrDefault(p, 0L) + d
      if (c == 0L) counts.remove(p) else counts.put(p, c)
    }
    @inline def index(p: (String, String), w: Int): Unit =
      where.computeIfAbsent(p, _ => new java.util.BitSet()).set(w)
    var w = 0
    while (w < syms.length) {
      val s = syms(w)
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1)); bump(p, freqs(w)); index(p, w); j += 1
      }
      w += 1
    }
    var rank = startRank
    while (rank <= numMerges && !counts.isEmpty) {
      // argmax with the distributed tie-break: count DESC, then
      // (left, right) ascending in UTF-8 byte order
      var bl: String = null; var br: String = null; var bc = Long.MinValue
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val (l, r) = e.getKey
        val c = e.getValue
        if (c > bc || (c == bc && {
          val dl = utf8Cmp(l, bl); dl < 0 || (dl == 0 && utf8Cmp(r, br) < 0)
        })) { bl = l; br = r; bc = c }
      }
      merges += ((rank, bl, br, bc))
      val best = (bl, br)
      val cand = where.remove(best)
      if (cand != null) {
        var i = cand.nextSetBit(0)
        while (i >= 0) {
          val s = syms(i)
          var has = false
          var j = 0
          while (!has && j + 1 < s.length) {
            if (s(j) == bl && s(j + 1) == br) has = true; j += 1
          }
          if (has) { // stale index entries just skip
            j = 0
            while (j + 1 < s.length) { bump((s(j), s(j + 1)), -freqs(i)); j += 1 }
            val ns = applyMergeLocal(s, bl, br)
            syms(i) = ns
            j = 0
            while (j + 1 < ns.length) {
              val p = (ns(j), ns(j + 1)); bump(p, freqs(i)); index(p, i); j += 1
            }
          }
          i = cand.nextSetBit(i + 1)
        }
      }
      rank += 1
    }
  }

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
      reliableCheckpoint: Boolean = false): DataFrame =
    trainHybrid(docs, textCol, numMerges, distributedRounds = numMerges,
      checkpointEvery, reliableCheckpoint)

  /** The production-vocab trainer: run the first `distributedRounds`
    * merges as distributed rounds (identical to [[train]]), then
    * COLLECT the distinct-word frequency table once and run the
    * remaining merges driver-local with incrementally-maintained pair
    * statistics — BIT-IDENTICAL output (property-tested: same merge
    * table for any split point, including the tie-break, which
    * compares UTF-8 bytes exactly as Spark's UTF8String ordering
    * does).
    *
    * Why this is the right 100 TB shape for 32k-merge vocabularies:
    * the statistics of BPE are a pure function of the DISTINCT-WORD
    * table (Sennrich §3.2), which is model-sized — tens of millions
    * of (word, freq) rows, tens-to-hundreds of MB — regardless of
    * corpus size. The corpus-sized work (tokenize + groupBy) stays
    * distributed; all-distributed rounds then pay one tiny argmax JOB
    * per merge (32k sequential jobs ≈ hours of pure scheduling
    * latency), while the driver-local continuation pays one collect
    * and then runs merge rounds at memory speed with Sennrich-style
    * incremental stats (only words containing the winning pair are
    * touched per round). `distributedRounds = 0` collects right after
    * the word table builds; a deployment that cannot afford the
    * collect sets `distributedRounds = numMerges` and gets pure
    * [[train]].
    */
  def trainHybrid(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      distributedRounds: Int,
      checkpointEvery: Int = 4,
      reliableCheckpoint: Boolean = false): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(distributedRounds >= 0,
      s"distributedRounds must be >= 0, got $distributedRounds")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    val spark = docs.sparkSession
    graft.core.Exact.requireAnsi(spark, "BpeTrainer.train")
    // lazy local checkpoint: the next round's argmax (or the hybrid
    // collect) is the action that materializes it — one job per
    // cadence point, not two (see componentsStar). Reliable stays
    // eager (checkpoint files are written after the first action,
    // which would recompute).
    def cp(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(true) else df.localCheckpoint(false)

    var words = cp(docs
      .select(explode(graft.functions.Text.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), split(col("w"), "").as("syms")))
    var prevCp = checkpointRdd(words)
    var sinceCp = 0
    // a superseded checkpoint must outlive its successor's FIRST
    // action (the successor's lazy-cp plan reads its blocks) — free it
    // only after the next argmax/collect has materialized the successor
    var pendingFree: Option[RDD[_]] = None

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    val distBound = math.min(numMerges, distributedRounds)
    while (rank <= distBound && !done) {
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
      // the argmax just materialized `words` — its superseded
      // predecessor is now safe to free
      pendingFree.foreach(OpCache.freeRdd(_))
      pendingFree = None
      if (best.isEmpty) done = true
      else {
        val Row(l: String, r: String, cnt: Long) = best(0)
        merges += ((rank, l, r, cnt))
        val nextPlan = words.withColumn("syms", applyMerge(col("syms"), l, r))
        sinceCp += 1
        if (sinceCp >= checkpointEvery || rank == distBound) {
          val next = cp(nextPlan)
          pendingFree = prevCp // still backs `next` until its first action
          prevCp = checkpointRdd(next)
          words = next
          sinceCp = 0
        } else words = nextPlan
        rank += 1
      }
    }
    if (!done && rank <= numMerges) {
      // hybrid continuation: one model-sized collect of the word
      // table (decoded from UTF8String, so the driver sees exactly
      // the strings the distributed rounds operated on), then
      // driver-local rounds with incremental pair stats
      val rows = words.select(col("freq"), col("syms")).collect()
      pendingFree.foreach(OpCache.freeRdd(_))
      pendingFree = None
      val freqs = rows.map(_.getLong(0))
      val syms = rows.map(_.getSeq[String](1).toArray)
      localRounds(freqs, syms, rank, numMerges, merges)
    }
    // the word table is training state, not the result — the model
    // is driver-sized by construction (numMerges rows). Free it now.
    pendingFree.foreach(OpCache.freeRdd(_))
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
