package graft.operators

import graft.functions.{Text, TextExpressions}
import graft.core.OpCache.TrackedPersist
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the ranking function
  * behind Lucene/Elasticsearch defaults (Robertson et al., Okapi at
  * TREC-3; the idf variant is Lucene's `log(1 + (N - df + 0.5) /
  * (df + 0.5))`, which stays positive for df > N/2).
  *
  * A training-data pipeline uses this for corpus curation queries
  * ("pull the top-k documents about X") and contamination forensics
  * ("which documents score highest against this benchmark prompt?").
  *
  * 100 TB shape — the plan is deliberately inverted-index-free:
  *
  *  1. ONE map-side pass projects per-doc state: the token array, its
  *     length `dl`, and per-query-term term frequencies (array HOFs
  *     over the tokens — no explode, no per-term shuffle).
  *  2. ONE tiny mergeable aggregate (count / sum / per-term
  *     contains-counts — all algebraic, map-side combined) produces the
  *     corpus stats `N, total_len, df_t` as a SINGLE ROW, broadcast
  *     back. Cost is independent of vocabulary size: stats exist only
  *     for the handful of query terms, never for the corpus vocabulary
  *     (a vocabulary groupBy at 100 TB is the classic mistake this
  *     avoids — same argument as the Misra-Gries q70 design).
  *  3. Scoring is a pure projection (idf and avgdl come from the
  *     broadcast row), then a global top-k via TakeOrdered — per
  *     partition top-k then a k-row merge on the driver, never a
  *     global sort.
  *
  * Determinism/oracle parity: every reduction is over integers (token
  * counts, doc counts) so partial-merge order cannot change a bit; the
  * floating-point score is computed in ONE fixed expression-tree order
  * from those integers and rounded at 6dp before ranking; ties at the
  * rounded score break on the doc id.
  */
object Retrieval {

  /** Top-k BM25 retrieval of `terms` over `docs(idCol, textCol)`.
    *
    * Score(d) = Σ_t idf(t) · (tf · (k1+1)) / (tf + k1·(1−b + b·dl/avgdl))
    * summed in the fixed order of `terms`; docs matching no term are
    * dropped. Output: (idCol, dl, score) ranked by (score desc, id).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    // per-doc state in ONE token pass: the tf VECTOR (term i →
    // occurrences) comes from the native single-scan kernel
    // (TermTfCounts: O(dl + T) per doc), not T separate
    // size(filter(...)) HOFs (O(dl · T) — each term re-walks the
    // whole token array), so cost stays flat as the query grows from
    // 3 to 100 terms
    val toks = docs.select(col(idCol), Text.tokens(col(textCol)).as("_toks"))
      .withColumn("_dl", size(col("_toks")).cast("long"))
      .withColumn("_tfs", TextExpressions.termTfs(col("_toks"), terms))

    // single-row corpus stats: mergeable integer aggregates only
    val statAggs: Seq[Column] =
      Seq(count(lit(1)).as("_n"), sum(col("_dl")).as("_len")) ++
        terms.indices.map { i =>
          sum(when(element_at(col("_tfs"), i + 1) > lit(0L), 1L)
            .otherwise(0L)).as(s"_df$i")
        }
    val stats = toks.agg(statAggs.head, statAggs.tail: _*)

    val scored = toks.crossJoin(broadcast(stats))
    val dlD = col("_dl").cast("double")
    val nD = col("_n").cast("double")
    val avgdl = col("_len").cast("double") / nD
    // per-term score, summed in fixed `terms` order (left-assoc, same
    // tree as the oracle SQL's `t0 + t1 + ...`)
    val score: Column = terms.indices.map { i =>
      val tf = element_at(col("_tfs"), i + 1).cast("double")
      val dfD = col(s"_df$i").cast("double")
      val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
      when(tf > lit(0.0),
        (idf * (tf * (lit(k1) + lit(1.0)))) /
          (tf + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (dlD / avgdl))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)

    scored
      .withColumn("score", round(score, 6))
      .filter(col("score") > lit(0.0))
      .select(col(idCol), col("_dl").as("dl"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** BATCH multi-query BM25: all `queries` scored in ONE corpus pass.
    * Per-query `bm25TopK` calls pay a full scan each — a curation
    * workload with hundreds of standing queries cannot afford Q scans
    * of 100 TB. Here the union of all query terms feeds one native
    * tf-vector kernel pass (O(dl + |terms|) per doc), the corpus
    * stats stay ONE mergeable row (df per distinct term), scoring is
    * a projection that fans each doc out to its Q (query_id, score)
    * pairs, and the per-query top-k is the MERGEABLE grouped bottom-k
    * (q110 machinery) on the negated 6-dp-scaled score — map-side
    * partials reduce every partition to ≤k rows per query, so the
    * one shuffle carries ≤ Q·k·partitions rows, never the corpus. No
    * window, no global sort.
    *
    * Scores are identical to [[bm25TopK]] on the same terms: same
    * Lucene idf, same fixed left-associative per-term sum, same 6-dp
    * round before ranking, ties on ascending id.
    *
    * The bottom-k pair key narrows the doc id to BIGINT, so the BATCH
    * retrievers require a numeric id column (enforced loudly below);
    * the single-query rankers preserve the native id type.
    *
    * Output: (query_id BIGINT, rank BIGINT, idCol BIGINT, score).
    */
  def bm25TopKBatch(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "each query needs at least one term")
    requireNumericId(docs, idCol, "bm25TopKBatch")
    val allTerms = queries.flatMap(_._2).distinct
    val toks = docs.select(col(idCol), Text.tokens(col(textCol)).as("_toks"))
      .withColumn("_dl", size(col("_toks")).cast("long"))
      .withColumn("_tfs", TextExpressions.termTfs(col("_toks"), allTerms))
    val statAggs: Seq[Column] =
      Seq(count(lit(1)).as("_n"), sum(col("_dl")).as("_len")) ++
        allTerms.indices.map { i =>
          sum(when(element_at(col("_tfs"), i + 1) > lit(0L), 1L)
            .otherwise(0L)).as(s"_df$i")
        }
    val stats = toks.agg(statAggs.head, statAggs.tail: _*)
    val scored = toks.crossJoin(broadcast(stats))
    val dlD = col("_dl").cast("double")
    val nD = col("_n").cast("double")
    val avgdl = col("_len").cast("double") / nD
    def termScore(i: Int): Column = {
      val tf = element_at(col("_tfs"), i + 1).cast("double")
      val dfD = col(s"_df$i").cast("double")
      val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
      when(tf > lit(0.0),
        (idf * (tf * (lit(k1) + lit(1.0)))) /
          (tf + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (dlD / avgdl))))
        .otherwise(lit(0.0))
    }
    // fan out to (query_id, score) structs — generator input is an
    // array over ALREADY-PROJECTED cheap expressions (the tf vector
    // is an attribute), so nothing expensive re-inlines (the r13
    // generator-shape rule)
    val qStructs = queries.map { case (qid, terms) =>
      val sc = terms.map(t => termScore(allTerms.indexOf(t))).reduce(_ + _)
      struct(lit(qid).as("q"), round(sc, 6).as("s"))
    }
    scored
      .select(col(idCol), explode(array(qStructs: _*)).as("_e"))
      .filter(col("_e.s") > lit(0.0))
      .select(col("_e.q").as("query_id"),
        (-round(col("_e.s") * 1e6)).cast("long").as("_k"),
        col(idCol).cast("long").as("_id"))
      .groupBy("query_id")
      .agg(graft.functions.BottomK.bottomK(k)(col("_k"), col("_id")).as("_s"))
      .select(col("query_id"), posexplode(col("_s")))
      .select(col("query_id"), (col("pos") + 1L).cast("long").as("rank"),
        col("col._2").as(idCol),
        (-col("col._1").cast("double") / 1e6).as("score"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fuse N ranked lists by score(q, d) = Σ_lists 1/(c + rank_list(d))
    * — the standard hybrid-retrieval combiner (sparse BM25 ⊕ dense
    * ANN) precisely because it needs no score calibration between
    * modalities, only ranks. Contributions are EXACT integers
    * (10^12 div (c + rank) — integer division, no floats anywhere),
    * so fusion sums, ordering, and ties are engine-exact by
    * construction; the quantization cannot reorder single-list
    * contributions (monotone in rank) and cross-list ties break on
    * ascending id.
    *
    * At scale: each input list is already top-k (≤ Q·k rows), the
    * fusion groupBy is map-side combinable, and the per-query top-k
    * is the mergeable grouped bottom-k — the whole fuse never
    * shuffles more than the lists themselves.
    *
    * Output: (queryCol, rank, idCol, rrf BIGINT — the 10^12-scaled
    * fused score, n_lists BIGINT — how many input lists ranked it).
    */
  /** Per-document TF-IDF keyword extraction: the top-`k` terms of
    * each document by `tf × ln(N/df)` — the classic topic-tagging /
    * feature-extraction pass (Salton & Buckley 1988) a curation
    * pipeline uses to label documents and drive per-topic sampling.
    *
    * Unlike [[bm25TopK]] (a handful of query terms, vocabulary-free),
    * keyword extraction NEEDS the corpus document-frequency table —
    * but that table is vocabulary-sized, not corpus-sized, and both
    * aggregates are map-side combinable: per-doc tf is a groupBy on
    * (doc, token); df is a groupBy on token over the ALREADY
    * per-doc-distinct tf rows (no count_distinct Expand). The join
    * back to score is on the uniform token key; ranking windows
    * partition by doc — uniform too. Nothing funnels.
    *
    * Determinism: idf is `ln(N/df)` rounded to 9 dp (absorbing any
    * libm ulp drift), the score is the EXACT DECIMAL product
    * tf × idf₉ — ties rank by token, so cross-engine order is total.
    */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = df.select(col(idCol), explode(Text.tokens(col(textCol))).as("_t"))
    val tf = toks.groupBy(col(idCol), col("_t")).agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("_t").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("_n"))
    val scored = tf.join(dfc, "_t").crossJoin(broadcast(n))
      .withColumn("_idf9",
        round(log(col("_n").cast("double") / col("df").cast("double")), 9)
          .cast("decimal(18,9)"))
      .withColumn("_score", col("tf").cast("decimal(20,0)") * col("_idf9"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("_score").desc, col("_t"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("_t").as("token"),
        col("tf"), col("df"),
        round(col("_score"), 6).cast("double").as("score"))
  }

  def rrfFuse(rankings: Seq[DataFrame], queryCol: String, idCol: String,
      rankCol: String, k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "RRF needs at least one ranking")
    val unioned = rankings.map(_.select(
        col(queryCol).cast("long").as("_q"),
        col(idCol).cast("long").as("_id"),
        expr(s"1000000000000L div ($c + cast(`$rankCol` as bigint))").as("_c")))
      .reduce(_ unionByName _)
    val fused = unioned.groupBy("_q", "_id")
      .agg(sum(col("_c")).as("rrf"), count(lit(1)).as("n_lists"))
    fused
      .groupBy("_q")
      .agg(graft.functions.BottomK.bottomK(k)(-col("rrf"), col("_id")).as("_s"))
      .select(col("_q"), posexplode(col("_s")))
      .select(col("_q"), (col("pos") + 1L).cast("long").as("rank"), col("col._2").as("_id"))
      .join(fused, Seq("_q", "_id"))
      .select(col("_q").as(queryCol), col("rank"), col("_id").as(idCol),
        col("rrf"), col("n_lists"))
  }

  /** The batch retrievers' bottom-k pair key is a BIGINT, so a
    * non-numeric id would silently cast to null — fail loudly
    * instead (ADVICE r18). */
  private def requireNumericId(df: DataFrame, idCol: String,
      fn: String): Unit = {
    val t = df.schema(idCol).dataType
    require(t.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$fn keys its mergeable bottom-k on a BIGINT doc id; column " +
        s"'$idCol' has type $t — cast it to a numeric id first (the " +
        "single-query rankers preserve the native id type)")
  }

  // ---------------------------------------------------------------
  // Stored-index internals shared by the frequency and positional
  // writers/appenders/servers.
  // ---------------------------------------------------------------

  /** One tokenize pass shared by every sidecar a write/append emits
    * (postings, stats, doclens — ADVICE r18: the delta was being
    * re-scanned and re-tokenized three times): (id, _toks, dl).
    */
  private def tokenized(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), Text.tokens(col(textCol)).as("_toks"))
      .withColumn("dl", size(col("_toks")).cast("long"))

  /** Postings rows of a corpus slice against a fixed bucket count:
    * one (term, id, dl, tf, _gen, _slice, bucket) row per distinct
    * term of each doc — tf from a within-doc (term, doc)
    * partial-aggregated count, bucket = pmod(murmur3(term),
    * nBuckets), `_gen` the generation stamp of the slice (0 for a
    * base build, the append's generation otherwise), `_slice` the
    * slice's COMMIT nonce (see [[appendToInvertedIndex]]). Shared by
    * the writer and the appender so appended postings are BY
    * CONSTRUCTION the rows a full rebuild would produce.
    */
  private def postingsRows(toks: DataFrame, nBuckets: Int,
      gen: Long, slice: String): DataFrame =
    toks.select(col("id"), col("dl"), explode(col("_toks")).as("term"))
      .groupBy(col("term"), col("id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .select(col("term"), col("id"), col("dl"), col("tf"),
        lit(gen).as("_gen"), lit(slice).as("_slice"),
        pmod(hash(col("term")), lit(nBuckets)).as("bucket"))

  /** One mergeable stats row for a corpus slice: doc count and total
    * token length (plus the index's bucket count, constant across
    * rows). Serving SUMS the COMMITTED stats rows — and, when
    * re-ingests have superseded docs, subtracts the stale instances'
    * contribution from the doclens sidecar — so N and avgdl after
    * any append sequence are exactly the full-rebuild values.
    */
  private def statsRow(toks: DataFrame, nBuckets: Int,
      slice: String): DataFrame =
    toks.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("total_len"))
      .withColumn("n_buckets", lit(nBuckets))
      .withColumn("_slice", lit(slice))

  /** Per-doc length sidecar rows: (id, dl, _gen, _slice, bucket)
    * with bucket = pmod(murmur3(id), nBuckets) — the slim table that
    * makes the stats CORRECTION for superseded docs a bounded read:
    * a stale doc's (1, dl) contribution to the summed stats is
    * recovered from its doclens row, and the tombstoned ids' buckets
    * land as literals in the partition column, so the correction
    * reads at most min(|re-ingested|, nBuckets) directories — never
    * the corpus-sized postings.
    */
  private def doclensRows(toks: DataFrame, nBuckets: Int,
      gen: Long, slice: String): DataFrame =
    toks.select(col("id"), col("dl"), lit(gen).as("_gen"),
      lit(slice).as("_slice"),
      pmod(hash(col("id")), lit(nBuckets)).as("bucket"))

  /** The base build's slice label — always committed by definition
    * (overwrite semantics: a base write either completes or the
    * index does not exist). */
  private val BaseSlice = "base"

  /** The tombstone sidecar if any append has happened, else None —
    * a base index's serving plan stays byte-identical to pre-append
    * (no join or slice filter is added until the first tombstone
    * exists). Mirrors `Similarity.readTombstones` (the ANN tier,
    * q207). The tombstone table doubles as the COMMIT MANIFEST:
    * (id, gen, slice, batch_key) rows, written LAST by every append.
    */
  private def readTombstones(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  private def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Everything serving needs from the tombstone/commit manifest, in
    * ONE slim read: the committed slice labels (+ "base") and the
    * max tombstone generation per re-ingested id. Both are
    * manifest-sized (cumulative appends / re-ingests), the same
    * bounded-collect discipline as the probe-bucket jobs.
    */
  private case class TombState(committed: Seq[String], tmax: DataFrame)

  /** Small LRUs keyed on (session token, path, asOf, manifest
    * fingerprint — `ManifestOps.dirSig`): [[TombState]] and the
    * serve stats are per-INDEX-STATE, not per-query (VERDICT r19
    * item 6) — a high-QPS serving loop was paying the manifest's
    * distinct-slice collect, the stats head and the stale-stats
    * probe on EVERY call. The fingerprint key self-invalidates on
    * any manifest/stats change (the writers never mutate files in
    * place — append/overwrite only), so a hit is always the current
    * state; 64 entries bound the footprint (cached values are a
    * slice-label list, a lazy tmax plan and five longs — no
    * corpus-sized object). Cache fills run OUTSIDE the map mutex
    * (`ManifestOps.cached`) so one cold index never stalls warm
    * serves of others.
    */
  private val tombCache = ManifestOps.lruCache[TombState](64)
  private val statsCache = ManifestOps.lruCache[(Long, Long, Int, Long, Long)](64)

  /** Drop all cached serve state (spec isolation). */
  private[graft] def clearServeCaches(): Unit = {
    tombCache.clear(); statsCache.clear()
  }

  /** `asOf` = TIME TRAVEL: consider only manifest rows with
    * gen ≤ asOf, so slices committed later — and deletes issued
    * later — are invisible, reproducing the index state a past
    * reader saw (generation numbers are the index's commit clock).
    * Cached per (path, asOf, manifest fingerprint) — repeated serves
    * of an unchanged index pay the manifest read once. `sig0` lets a
    * caller that also caches DERIVED state (the serve stats) pin the
    * SAME fingerprint for both reads: re-listing inside could see a
    * newer manifest and file state-S1 values under a state-S2 key
    * (the TOCTOU a concurrent appender opens).
    */
  private def tombState(spark: SparkSession, path: String,
      asOf: Long = Long.MaxValue,
      sig0: String = null): Option[TombState] = {
    val sig = Option(sig0).getOrElse(
      ManifestOps.dirSig(spark, s"$path/tombstones"))
    if (sig == "none") None
    else Some(ManifestOps.cached(tombCache,
      ManifestOps.cacheKey(ManifestOps.tokenOf(spark), asOf, path, sig)) {
        val raw = spark.read.parquet(s"$path/tombstones")
        val t = if (asOf == Long.MaxValue) raw
          else raw.filter(col("gen") <= asOf)
        val committed = t.select(col("slice")).distinct()
          .collect().map(_.getString(0)).toSeq :+ BaseSlice
        TombState(committed, t.groupBy("id").agg(max("gen").as("_tg")))
      })
  }

  /** Keep only rows of COMMITTED slices — the exactly-once half of
    * the lifecycle: an append attempt that died before its tombstone
    * write left rows whose `_slice` nonce never reached the manifest,
    * and this filter makes them permanently invisible (the retry
    * writes fresh rows under a NEW nonce). A conjunctive data filter
    * on the scan: pushes to parquet, never disturbs the bucket
    * partition prune.
    *
    * ON-DISK FORMAT note (ADVICE r19): serving requires `_slice` on
    * the data rows and `slice`/`batch_key` on the manifest — the
    * slice-commit layout every writer in this version produces. An
    * index APPENDED under the pre-slice-commit layout fails here
    * with an AnalysisException on the missing column; REBUILD it
    * ([[writeInvertedIndex]]/[[writePositionalIndex]]) rather than
    * migrating in place. A never-appended base index has no manifest
    * and never reaches this filter.
    */
  private def committedRows(rows: DataFrame,
      ts: Option[TombState]): DataFrame =
    ts.map(s => rows.filter(col("_slice").isin(s.committed: _*)))
      .getOrElse(rows)

  /** [[committedRows]] + drop rows superseded by a NEWER tombstone
    * for their id. The supersede must be an id-level broadcast
    * filter, not a within-partition dedup: a re-crawled doc's stale
    * postings live under the STALE text's term buckets (resp. the
    * stale doc-hash bucket), which the replacement's partitions
    * never touch — the exact argument at `Similarity.scala` (q207's
    * tombstone supersede), lexical edition. Rows whose `_gen` equals
    * their id's max tombstone generation are the replacement itself
    * and survive.
    */
  private def liveRows(rows: DataFrame,
      ts: Option[TombState]): DataFrame =
    ts.map { s =>
      committedRows(rows, ts)
        .join(broadcast(s.tmax), Seq("id"), "left")
        .filter(col("_tg").isNull || col("_gen") >= col("_tg"))
        .drop("_tg")
    }.getOrElse(rows)

  /** Next generation stamp for an append at `path`: one past the
    * newest COMMITTED tombstone (0-generation base rows are never
    * tombstoned, so the first append is generation 1). A failed
    * attempt never reached the manifest, so its retry recomputes the
    * SAME generation — harmless, because the orphan rows differ by
    * slice nonce and stay uncommitted forever.
    *
    * SINGLE-WRITER contract: this is read-max-plus-one, not a CAS —
    * two writers that both read the manifest before either commits
    * compute the SAME generation, and supersede order between their
    * rows is undefined. Every committer therefore runs
    * [[verifySoleWriter]] after its manifest write, turning the
    * silent corruption into a loud post-commit failure.
    */
  private def nextGen(spark: SparkSession, path: String): Long =
    1L + readTombstones(spark, path)
      .map(_.agg(coalesce(max("gen"), lit(0L))).head().getLong(0))
      .getOrElse(0L)

  /** True iff `batchKey` already appears in the commit manifest —
    * the idempotent-re-delivery guard for streaming ingest. */
  private def batchCommitted(spark: SparkSession, path: String,
      batchKey: String): Boolean =
    readTombstones(spark, path).exists(
      _.filter(col("batch_key") === batchKey).take(1).nonEmpty)

  /** Post-commit single-writer verification — ONE shared definition
    * for both manifest layouts (`ManifestOps.verifySoleWriter`,
    * VERDICT r19 item 1): raise loudly, both nonces named, if a
    * foreign slice shares this commit's generation.
    */
  private[graft] def verifySoleWriter(spark: SparkSession, path: String,
      gen: Long, slice: String): Unit =
    ManifestOps.verifySoleWriter(spark, path, gen, slice)

  /** Create an EMPTY commit manifest (schema, zero rows) before the
    * FIRST append's data writes. Without it, a first append dying
    * mid-write would leave orphan rows indistinguishable from a
    * never-appended base index — whose fast path skips the committed
    * filter. With it, the manifest's existence flips serving to
    * committed-slices mode BEFORE any uncommitted row can exist; a
    * base index that has never seen an append keeps its
    * filter-free plan.
    */
  private def ensureManifest(ids: DataFrame, path: String): Unit = {
    val spark = ids.sparkSession
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      ids.select(col("id"), lit(0L).as("gen"), lit("").as("slice"),
          lit(null).cast("string").as("batch_key"))
        .limit(0).write.mode("append").parquet(p.toString)
  }

  /** STORED INVERTED INDEX — the lexical twin of the stored ANN index
    * (`Similarity.writeIvfPqIndex`): tokenize and aggregate ONCE,
    * serve forever. Postings (term, id, dl, tf) are written
    * `partitionBy(bucket)` with bucket = hash(term) % nBuckets, so a
    * T-term query reads at most T bucket DIRECTORIES of a
    * corpus-sized table (PlanShapeSpec locks the partition prune);
    * the stats sidecar is one mergeable (n_docs, total_len) row, and
    * a slim per-doc `doclens` sidecar (id-hash-bucketed) backs the
    * stats correction after re-ingest appends. Per-term df is NOT a
    * sidecar: it is the live posting-row count of the term, exact
    * from the probed bucket alone — nothing corpus-wide is read at
    * serve time.
    *
    * A REBUILD resets the generation clock: stale tombstones from a
    * previous append at this path would otherwise drop the fresh
    * gen-0 postings at serve time (the ANN tier's rebuild rule,
    * `Similarity.writeIvfPqIndex`).
    *
    * 100 TB shape: the build is one explode + one (term, doc)-keyed
    * partial-agg exchange (never a vocabulary-sized key — (term, doc)
    * cardinality is bounded by total tokens); serving reads T
    * directories, broadcasts a T-row df frame, and ranks with the
    * same TakeOrdered top-k as [[bm25TopK]] — no global sort, no
    * full scan per query.
    */
  def writeInvertedIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = docs.sparkSession
    deleteDir(spark, s"$path/tombstones")
    val toks = tokenized(docs, idCol, textCol).persistTracked
    postingsRows(toks, nBuckets, 0L, BaseSlice)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings")
    statsRow(toks, nBuckets, BaseSlice)
      .write.mode("overwrite").parquet(s"$path/stats")
    doclensRows(toks, nBuckets, 0L, BaseSlice)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/doclens")
  }

  /** INCREMENTAL APPEND to a stored inverted index — a 100 TB corpus
    * is never re-tokenized from scratch per crawl (the q85/q148/q179/
    * q207 incremental discipline, lexical edition). Delta postings
    * are a pure per-doc function of (text, nBuckets), appended into
    * the bucket partition directories; the stats sidecar gains one
    * row and serving SUMS rows, so N, avgdl and every df — and hence
    * EVERY score, including those of pre-existing docs — equal the
    * full-rebuild values exactly (q220 gates serving over
    * base+append against the full-corpus SQL replay).
    *
    * RE-INGESTED ids supersede their stale state through a TOMBSTONE
    * sidecar (the ANN tier's q207 mechanism, lexical edition): each
    * append records (id, gen) rows, and serving drops any postings
    * row with a newer tombstone for its id — necessary because a
    * re-crawled doc's changed text scatters stale postings across
    * OTHER term buckets, where no within-bucket dedup can see them.
    * The summed stats are corrected by subtracting the stale
    * instances' (1, dl) contributions, recovered from the id-bucketed
    * doclens sidecar under a literal bucket prune (re-ingest-bounded
    * directories). Serving over the appended index ≡ a full rebuild
    * over (base \ re-ingested) ∪ delta — q231 gates it against the
    * true-corpus SQL replay; when cumulative tombstones grow large,
    * [[compactInvertedIndex]] folds them away.
    *
    * EXACTLY-ONCE commit protocol (what makes streaming ingest safe,
    * q237): every append stamps its postings/stats/doclens rows with
    * a fresh SLICE NONCE and writes the tombstone manifest LAST —
    * the manifest write is the commit point. Serving reads only
    * committed slices ([[committedRows]]), so an attempt that died
    * mid-append left rows that are permanently invisible; the retry
    * recomputes the same generation (the manifest didn't change) but
    * a new nonce, and only its completed write commits. Re-delivery
    * of an already-COMMITTED batch is skipped via `batchKey` (the
    * Structured Streaming replay contract: a batchId re-runs only
    * until its foreachBatch returns). The manifest write itself is
    * coalesced to ONE part file, so the commit is a single
    * rename/PUT — atomic on HDFS/posix and object stores alike; a
    * multi-file manifest job could crash having published only some
    * of its part files, leaving the slice visible with part of its
    * supersede rows missing (ADVICE r19).
    *
    * Preconditions: ids are unique WITHIN one delta (the q179
    * contract, narrowed); re-ingesting ids from the base or earlier
    * appends is the supported re-crawl path. An empty delta is a
    * no-op — no stats row, no new generation. SINGLE WRITER per
    * index path: the generation stamp is read-max-plus-one, not a
    * CAS, so two concurrent appenders would share a generation —
    * [[verifySoleWriter]] re-reads the manifest post-commit and
    * fails LOUDLY (both nonces named) instead of corrupting
    * supersede order silently.
    */
  def appendToInvertedIndex(deltaDocs: DataFrame, idCol: String,
      textCol: String, path: String, batchKey: String = null): Unit = {
    val spark = deltaDocs.sparkSession
    if (batchKey != null && batchCommitted(spark, path, batchKey)) return
    // ONE tokenize pass feeds the emptiness probe and all four
    // sidecar writes (ADVICE r18: the delta plan was evaluated
    // three times)
    val toks = tokenized(deltaDocs, idCol, textCol).persistTracked
    if (toks.select(col("id")).take(1).isEmpty) return
    val nBuckets = spark.read.parquet(s"$path/stats")
      .select(max(col("n_buckets"))).head().getInt(0)
    ensureManifest(toks, path)
    val gen = nextGen(spark, path)
    val slice = java.util.UUID.randomUUID().toString
    postingsRows(toks, nBuckets, gen, slice)
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$path/postings")
    statsRow(toks, nBuckets, slice)
      .write.mode("append").parquet(s"$path/stats")
    doclensRows(toks, nBuckets, gen, slice)
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$path/doclens")
    // the COMMIT: manifest rows land last, as ONE file (coalesce(1)
    // — a multi-file manifest job could crash mid-commit having
    // published a subset of its part files, leaving the slice
    // half-committed; one file = one rename/PUT, atomic on HDFS and
    // object stores alike; manifest rows are slim id+gen, so one
    // task absorbs even a large crawl batch)
    toks.select(col("id"), lit(gen).as("gen"), lit(slice).as("slice"),
        lit(batchKey).cast("string").as("batch_key"))
      .coalesce(1)
      .write.mode("append").parquet(s"$path/tombstones")
    verifySoleWriter(spark, path, gen, slice)
  }

  /** RIGHT-TO-BE-FORGOTTEN DELETE from a stored inverted index — the
    * takedown/opt-out batch a training-data pipeline must honor
    * without rewriting a corpus-sized table: a delete is a
    * TOMBSTONE-ONLY append (manifest rows at a fresh generation, no
    * postings/stats/doclens), and the existing supersede machinery
    * does the rest. Every postings row of a deleted id carries an
    * older generation, so serving drops it in EVERY term bucket; the
    * doclens correction subtracts the doc's (1, dl) instances from
    * N/total_len (a delete has no replacement rows, so ALL its
    * instances are stale); df/cf shrink via the live posting-row
    * counts. A LATER re-ingest of the id resurrects it (its
    * generation outranks the delete's); [[compactInvertedIndex]]
    * physically drops deleted rows. O(|deletes|) write cost —
    * nothing corpus-sized moves until compaction. Atomic: the
    * manifest write IS the whole delete, coalesced to one file (one
    * rename/PUT). `batchKey` gives streaming deletes the same
    * idempotent re-delivery skip as ingest; the single-writer
    * contract and post-commit collision check of
    * [[appendToInvertedIndex]] apply (a delete claims a generation
    * too).
    */
  def deleteFromInvertedIndex(ids: DataFrame, idCol: String,
      path: String, batchKey: String = null): Unit =
    tombstoneOnlyDelete(ids, idCol, path, batchKey)

  /** [[deleteFromInvertedIndex]] for a positional index — identical
    * manifest layout, identical semantics (q240 gates the phrase
    * serve after a delete against the filtered-corpus replay).
    */
  def deleteFromPositionalIndex(ids: DataFrame, idCol: String,
      path: String, batchKey: String = null): Unit =
    tombstoneOnlyDelete(ids, idCol, path, batchKey)

  private def tombstoneOnlyDelete(ids: DataFrame, idCol: String,
      path: String, batchKey: String): Unit = {
    val spark = ids.sparkSession
    if (batchKey != null && batchCommitted(spark, path, batchKey)) return
    val keyed = ids.select(col(idCol).as("id"))
    if (keyed.take(1).isEmpty) return
    ensureManifest(keyed, path)
    val gen = nextGen(spark, path)
    val slice = java.util.UUID.randomUUID().toString
    // one-file commit + post-commit collision check, as in
    // appendToInvertedIndex (the delete IS its manifest write)
    keyed.select(col("id"), lit(gen).as("gen"), lit(slice).as("slice"),
        lit(batchKey).cast("string").as("batch_key"))
      .coalesce(1)
      .write.mode("append").parquet(s"$path/tombstones")
    verifySoleWriter(spark, path, gen, slice)
  }

  /** The stale-instance correction to the SUMMED stats rows: docs
    * superseded by a newer tombstone contributed (1, dl) to the
    * stats row of the slice that ingested them — subtract it back
    * out, reading only the tombstoned ids' doclens bucket
    * directories (literal partition prune; the bucket list is a
    * tombstone-table-sized job, ≤ nBuckets values). Returns
    * (staleDocs, staleLen) — (0, 0) when no tombstones exist.
    */
  private def staleStats(spark: SparkSession, path: String,
      nBuckets: Int, ts: Option[TombState]): (Long, Long) =
    ts.map { s =>
      val buckets = s.tmax
        .select(pmod(hash(col("id")), lit(nBuckets)).as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      // committed slices only: an orphan doclens row was never
      // counted in the (committed-filtered) summed stats, so it must
      // not be subtracted either
      val r = committedRows(spark.read.parquet(s"$path/doclens")
          .filter(col("bucket").isin(buckets: _*)), ts)
        .join(broadcast(s.tmax), Seq("id"))
        .filter(col("_gen") < col("_tg"))
        .agg(count(lit(1)).as("c"),
          coalesce(sum(col("dl")), lit(0L)).as("l"))
        .head()
      (r.getLong(0), r.getLong(1))
    }.getOrElse((0L, 0L))

  /** POSITIONAL inverted index — [[writeInvertedIndex]]'s layout with
    * a per-(term, doc) sorted positions list (the classic Lucene
    * positions tradeoff: bigger postings buy phrase/proximity
    * queries without ever re-reading text). Kept as a SEPARATE
    * writer so the frequency-only index stays slim. Postings:
    * (term, id, dl, tf, positions, _gen) partitioned by
    * hash(term) % nBuckets; a meta sidecar carries the bucket count.
    * No stats/doclens sidecars: phrase and proximity serving are
    * pure per-doc functions of the probed postings, so the lifecycle
    * ([[appendToPositionalIndex]] / [[compactPositionalIndex]])
    * needs only the tombstone supersede, no stats correction. A
    * rebuild resets the generation clock.
    */
  def writePositionalIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    deleteDir(spark, s"$path/tombstones")
    positionalRows(docs, idCol, textCol, nBuckets, 0L, BaseSlice)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings")
    Seq(nBuckets).toDF("n_buckets")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Positional postings rows for one corpus slice — a pure per-doc
    * function of (text, nBuckets), shared by the writer and the
    * appender so appended rows ≡ the rows a full rebuild would
    * produce. */
  private def positionalRows(docs: DataFrame, idCol: String,
      textCol: String, nBuckets: Int, gen: Long,
      slice: String): DataFrame =
    docs.select(col(idCol).as("id"),
        Text.tokens(col(textCol)).as("_toks"))
      .withColumn("dl", size(col("_toks")).cast("long"))
      .select(col("id"), col("dl"),
        posexplode(col("_toks")).as(Seq("_p", "term")))
      .groupBy(col("term"), col("id"), col("dl"))
      .agg(sort_array(collect_list(col("_p") + 1)).as("positions"),
        count(lit(1)).as("tf"))
      .select(col("term"), col("id"), col("dl"), col("tf"),
        col("positions"), lit(gen).as("_gen"), lit(slice).as("_slice"),
        pmod(hash(col("term")), lit(nBuckets)).as("bucket"))

  /** INCREMENTAL APPEND to a positional index — the q231 lifecycle
    * on the positions layout: delta postings (a pure per-doc
    * function) land in the bucket partition directories with a fresh
    * generation stamp, and an (id, gen) tombstone row per delta doc
    * supersedes any stale postings a re-crawled id left in OTHER
    * term buckets. No stats sidecar exists to correct — phrase and
    * proximity are per-doc functions of the live postings — so
    * append ≡ rebuild needs nothing beyond the supersede (q232
    * gates the phrase serve, q233 the proximity serve after
    * compaction, both against the true-corpus replay). Ids unique
    * within one delta; empty delta is a no-op; single writer per
    * index path, enforced loudly post-commit
    * ([[appendToInvertedIndex]]'s contract).
    */
  def appendToPositionalIndex(deltaDocs: DataFrame, idCol: String,
      textCol: String, path: String, batchKey: String = null): Unit = {
    val spark = deltaDocs.sparkSession
    if (batchKey != null && batchCommitted(spark, path, batchKey)) return
    if (deltaDocs.select(col(idCol)).take(1).isEmpty) return
    val nBuckets = spark.read.parquet(s"$path/meta")
      .select(max(col("n_buckets"))).head().getInt(0)
    ensureManifest(deltaDocs.select(col(idCol).as("id")), path)
    val gen = nextGen(spark, path)
    val slice = java.util.UUID.randomUUID().toString
    positionalRows(deltaDocs, idCol, textCol, nBuckets, gen, slice)
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$path/postings")
    // one-file commit + post-commit collision check (see
    // appendToInvertedIndex)
    deltaDocs.select(col(idCol).as("id"), lit(gen).as("gen"),
        lit(slice).as("slice"),
        lit(batchKey).cast("string").as("batch_key"))
      .coalesce(1)
      .write.mode("append").parquet(s"$path/tombstones")
    verifySoleWriter(spark, path, gen, slice)
  }

  /** COMPACTION for a positional index: rewrite the LIVE postings
    * (tombstone supersede applied, generations reset to 0) into
    * fresh bucket partitions at a NEW path with no tombstone sidecar
    * — write-new-flip-pointer, as [[compactInvertedIndex]]. Serving
    * from the compacted index is bit-identical to the source.
    */
  def compactPositionalIndex(spark: SparkSession, srcPath: String,
      dstPath: String): Unit = {
    val ts = tombState(spark, srcPath)
    deleteDir(spark, s"$dstPath/tombstones")
    liveRows(spark.read.parquet(s"$srcPath/postings"), ts)
      .withColumn("_gen", lit(0L)).withColumn("_slice", lit(BaseSlice))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dstPath/postings")
    spark.read.parquet(s"$srcPath/meta")
      .write.mode("overwrite").parquet(s"$dstPath/meta")
    IndexLineage.write(spark, srcPath, dstPath,
      spark.read.parquet(s"$dstPath/postings")
        .agg(count_distinct(col("id"))).head().getLong(0))
  }


  /** `pmod(hash(term), nBuckets)` evaluated driver-side: the same
    * resolved Murmur3 expression (seed 42) the build plan uses, so the
    * probed bucket is identical by construction — minus the per-serve
    * T-row Spark job the `terms.toDF` formulation paid.
    */
  private def termBucket(t: String, nBuckets: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val h = new Murmur3Hash(Seq(Literal.create(t)))
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Int]
    ((h % nBuckets) + nBuckets) % nBuckets
  }

  /** The positional serve-side read shared by phrase and proximity:
    * probed-bucket postings for `terms`, tombstone supersede
    * applied. */
  private def positionalPostings(spark: SparkSession, path: String,
      terms: Seq[String], asOf: Long = Long.MaxValue): DataFrame = {
    val nBuckets = spark.read.parquet(s"$path/meta")
      .select(max(col("n_buckets"))).head().getInt(0)
    // same hash expression the build used, evaluated driver-side on
    // the literal terms (saves a per-serve T-row Spark job — the
    // pivotedFromIndex discipline)
    val buckets = terms.map(termBucket(_, nBuckets)).distinct
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(terms: _*))
    liveRows(postings, tombState(spark, path, asOf))
  }

  /** PHRASE occurrence counts served from a positional index
    * ([[writePositionalIndex]]): docs containing the exact token
    * sequence `phrase`, with their occurrence count. Reads ONLY the
    * phrase terms' bucket directories, pivots each distinct term's
    * positions array onto one row per doc, and counts the alignment
    * (positions p of the first term where every later term i sits at
    * p + i) — equivalent, by construction over whitespace tokens, to
    * counting the phrase's m-grams in the text (which is exactly how
    * the q225 oracle replays it; overlapping occurrences each
    * count). The alignment is a LEFT FOLD of set intersections over
    * the sorted positions arrays — aligned = pos₀ ∩ (pos₁ − 1) ∩ …
    * ∩ (pos_{m−1} − (m−1)), O(Σ tf) per doc via `array_intersect`
    * (positions are distinct within a doc, so set semantics are
    * exact), replacing the per-probe `array_contains` walk that was
    * O(tf₀ · Σ tf) on hot terms (VERDICT r18 item 3). A doc missing
    * any phrase term never aligns (missing arrays coalesce to
    * empty). Output: (idCol, phrase_tf) for docs with phrase_tf > 0,
    * which keeps the result a pure function of the probed buckets.
    */
  def phraseOccurrencesFromIndex(spark: SparkSession, path: String,
      idCol: String, phrase: Seq[String],
      asOfGen: Long = Long.MaxValue): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two terms")
    val terms = phrase.distinct
    val postings = positionalPostings(spark, path, terms, asOfGen)
    val emptyPos = array().cast("array<int>")
    val pivots = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("positions"))).as(s"_pos$i") }
    val perDoc = postings.groupBy(col("id"))
      .agg(pivots.head, pivots.tail: _*)
    def posOf(i: Int): Column =
      coalesce(col(s"_pos${terms.indexOf(phrase(i))}"), emptyPos)
    val aligned = phrase.indices.tail.foldLeft(posOf(0)) { (acc, i) =>
      array_intersect(acc, transform(posOf(i), p => p - i))
    }
    perDoc
      .select(col("id").as(idCol),
        size(aligned).cast("long").as("phrase_tf"))
      .filter(col("phrase_tf") > 0)
  }

  /** COMPACTION for a stored inverted index: after many crawl appends
    * a bucket directory holds one small file per append, the stats
    * sidecar one row per slice, and re-ingests pile up tombstones —
    * compaction rewrites the LIVE postings (supersede applied,
    * generations reset to 0) into fresh bucket partitions and
    * recomputes the stats as ONE row from the live doclens (exactly
    * the rebuild values, folding every tombstone correction away), at
    * a NEW path with no tombstone sidecar (write-new-flip-pointer,
    * the object-store-safe shape; an in-place rewrite would race its
    * own input). Serving from the compacted index is bit-identical to
    * the source (InvertedIndexSpec locks it, q226 gates it against
    * the full-corpus replay).
    *
    * RETENTION: the compacted index's generation clock restarts at 0,
    * so a run pinned to `asOfGen = N` of the SOURCE keeps serving
    * from the source path — compaction never touches it — until the
    * operator retires the pin and drops the path (q250 gates exactly
    * that read). The lineage sidecar ([[IndexLineage]], one row:
    * src_path, src_gen, n_live) records the link; [[indexHistory]]
    * surfaces it (q249).
    */
  def compactInvertedIndex(spark: SparkSession, srcPath: String,
      dstPath: String): Unit = {
    val nBuckets = spark.read.parquet(s"$srcPath/stats")
      .select(max(col("n_buckets"))).head().getInt(0)
    val ts = tombState(spark, srcPath)
    deleteDir(spark, s"$dstPath/tombstones")
    liveRows(spark.read.parquet(s"$srcPath/postings"), ts)
      .withColumn("_gen", lit(0L)).withColumn("_slice", lit(BaseSlice))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dstPath/postings")
    val liveDl = liveRows(spark.read.parquet(s"$srcPath/doclens"), ts)
      .persistTracked
    liveDl.select(col("id"), col("dl"), lit(0L).as("_gen"),
        lit(BaseSlice).as("_slice"), col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dstPath/doclens")
    liveDl.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("total_len"))
      .withColumn("n_buckets", lit(nBuckets))
      .withColumn("_slice", lit(BaseSlice))
      .write.mode("overwrite").parquet(s"$dstPath/stats")
    // retention/lineage contract (VERDICT r19 item 3): record the
    // source's final gen + live count; the OLD path stays servable
    // for every pinned asOfGen until the operator drops it
    IndexLineage.write(spark, srcPath, dstPath,
      spark.read.parquet(s"$dstPath/stats")
        .agg(coalesce(sum(col("n_docs")), lit(0L))).head().getLong(0))
  }

  /** INDEX HISTORY — the `DESCRIBE HISTORY` of the lakehouse-lite
    * commit manifest: one row per committed generation with its
    * batch key (null for ad-hoc appends/deletes) and how many doc
    * ids it touched. Generation numbers are the index's commit
    * clock; feed one to a serve function's `asOfGen` to TIME-TRAVEL
    * (q242). A delete generation shows its doc count too — the
    * manifest cannot distinguish a delete from an append by itself
    * (both are id rows at a generation; only deletes write no data),
    * which is exactly why this report exists for auditing. Manifest-
    * sized read; a never-appended base index reports zero rows.
    */
  def indexHistory(spark: SparkSession, path: String): DataFrame =
    // a compacted index leads its history with the lineage row
    // (gen 0, batch_key compact:gen=<source's final gen>) — the
    // recorded answer to "where did this fresh clock come from?"
    IndexLineage.withHistory(spark, path,
      readTombstones(spark, path).map(
        _.groupBy(col("gen"), col("batch_key"))
          .agg(count(lit(1)).as("n_docs")))
        .getOrElse(spark.range(0).select(lit(0L).as("gen"),
          lit(null).cast("string").as("batch_key"),
          lit(0L).as("n_docs"))))

  /** VOCABULARY REPORT from a stored index — corpus term statistics
    * (document frequency, collection frequency) as ONE aggregate over
    * the slim LIVE postings (tombstone supersede applied — a
    * re-crawled doc's stale terms must not count), never re-reading
    * text: df = posting-row count, cf = tf sum. Returns the top-k
    * terms by (df desc, term) — the q70 heavy-hitters shape served
    * from the index.
    */
  def vocabularyFromIndex(spark: SparkSession, path: String,
      k: Int): DataFrame =
    liveRows(spark.read.parquet(s"$path/postings"),
        tombState(spark, path))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      .orderBy(col("df").desc, col("term"))
      .limit(k)

  /** PROXIMITY search from a positional index
    * ([[writePositionalIndex]]): docs where `termA` and `termB`
    * co-occur within `window` tokens, with their minimal absolute
    * position distance — the slop-query companion to
    * [[phraseOccurrencesFromIndex]], reading only the two terms'
    * bucket directories. The per-doc min distance is a MERGE WALK:
    * tag each (already sorted) positions array with its source,
    * `array_sort` the union, and one linear fold tracks the last
    * position seen from each side — in ascending order the minimal
    * |a − b| is always realized by an adjacent cross-source pair, so
    * the fold is exact. O((tf_A + tf_B) log(tf_A + tf_B)) per doc,
    * replacing the nested O(tf_A · tf_B) pair fold that made two
    * stop-words in a 100k-token doc a 10¹⁰-op row (VERDICT r18
    * item 3; the hot-term bound is spec-locked). Output:
    * (idCol, min_dist) for docs with both terms and
    * min_dist ≤ window.
    */
  def proximityFromIndex(spark: SparkSession, path: String, idCol: String,
      termA: String, termB: String, window: Int,
      asOfGen: Long = Long.MaxValue): DataFrame = {
    require(window >= 1, "window must be at least 1")
    require(termA != termB, "proximity needs two distinct terms")
    val postings =
      positionalPostings(spark, path, Seq(termA, termB), asOfGen)
    val perDoc = postings.groupBy(col("id"))
      .agg(max(when(col("term") === termA, col("positions"))).as("_pa"),
        max(when(col("term") === termB, col("positions"))).as("_pb"))
      .filter(col("_pa").isNotNull && col("_pb").isNotNull)
    // merged (pos, src) stream, ascending by position (a position
    // belongs to exactly one term, so no cross-source ties exist)
    val tagged = concat(
      transform(col("_pa"), p => struct(p.as("pos"), lit(0).as("src"))),
      transform(col("_pb"), p => struct(p.as("pos"), lit(1).as("src"))))
    val st0 = struct(lit(-1).as("la"), lit(-1).as("lb"),
      lit(Int.MaxValue).as("best"))
    val minDist = aggregate(array_sort(tagged), st0,
      (st, e) => {
        val pos = e.getField("pos")
        val isA = e.getField("src") === 0
        val best =
          when(isA && st.getField("lb") >= 0,
            least(st.getField("best"), pos - st.getField("lb")))
          .when(!isA && st.getField("la") >= 0,
            least(st.getField("best"), pos - st.getField("la")))
          .otherwise(st.getField("best"))
        struct(
          when(isA, pos).otherwise(st.getField("la")).as("la"),
          when(!isA, pos).otherwise(st.getField("lb")).as("lb"),
          best.as("best"))
      },
      st => st.getField("best"))
    perDoc
      .select(col("id").as(idCol), minDist.cast("long").as("min_dist"))
      .filter(col("min_dist") <= window)
  }

  /** Top-k BM25 served from a stored index ([[writeInvertedIndex]]):
    * bit-identical to [[bm25TopK]] over the indexed corpus — the
    * per-term (tf, df) pairs are pivoted back into the SAME
    * fixed-`terms`-order left-associative score tree (each pivot
    * aggregate sums exactly one long, so every input to the float
    * arithmetic is the integer the full scan would produce), with
    * (N, total_len) read from the summed stats sidecar as plan
    * constants. The probed-bucket values are resolved by one
    * T-row job against the engine's own hash (never reimplemented
    * driver-side), then land as literals IN the partition column —
    * the codes-scan prune of q201, lexical edition.
    */
  /** BATCH multi-query BM25 served from a stored index — the
    * standing-queries workload ([[bm25TopKBatch]]) without the corpus
    * scan: the UNION of all query terms prunes the postings read to
    * its bucket directories once, per-doc (tf, df) pairs pivot back
    * into each query's OWN fixed-term-order score tree, and the
    * per-query top-k is the same mergeable grouped bottom-k on the
    * negated 6-dp-scaled score. Output rows are bit-identical to
    * [[bm25TopKBatch]] over the indexed corpus (InvertedIndexSpec
    * locks it; q223 gates serving against the per-query SQL replays)
    * — same scores, same ranks, same tie-breaks. Requires a NUMERIC
    * id (the [[bm25TopKBatch]] bottom-k key contract, checked
    * loudly); the single-query rankers preserve the native id type.
    */
  def bm25TopKBatchFromIndex(spark: SparkSession, path: String,
      idCol: String, queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      asOfGen: Long = Long.MaxValue): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "each query needs at least one term")
    val allTerms = queries.flatMap(_._2).distinct
    val (perDoc, nD, lenD, _) =
      pivotedFromIndex(spark, path, allTerms, asOfGen)
    requireNumericId(perDoc, "id", "bm25TopKBatchFromIndex")
    val avgdl = lenD / nD
    val dlD = col("dl").cast("double")
    def termScore(i: Int): Column = {
      val tf = coalesce(col(s"_tf$i"), lit(0L)).cast("double")
      val dfD = col(s"_df$i").cast("double")
      val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
      when(tf > lit(0.0),
        (idf * (tf * (lit(k1) + lit(1.0)))) /
          (tf + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (dlD / avgdl))))
        .otherwise(lit(0.0))
    }
    val qStructs = queries.map { case (qid, terms) =>
      val sc = terms.map(t => termScore(allTerms.indexOf(t))).reduce(_ + _)
      struct(lit(qid).as("q"), round(sc, 6).as("s"))
    }
    perDoc
      .select(col("id"), explode(array(qStructs: _*)).as("_e"))
      .filter(col("_e.s") > lit(0.0))
      .select(col("_e.q").as("query_id"),
        (-round(col("_e.s") * 1e6)).cast("long").as("_k"),
        col("id").cast("long").as("_id"))
      .groupBy("query_id")
      .agg(graft.functions.BottomK.bottomK(k)(col("_k"), col("_id")).as("_s"))
      .select(col("query_id"), posexplode(col("_s")))
      .select(col("query_id"), (col("pos") + 1L).cast("long").as("rank"),
        col("col._2").as(idCol),
        (-col("col._1").cast("double") / 1e6).as("score"))
  }

  /** The shared serve-side read: probed-bucket LIVE postings
    * (tombstone supersede applied — see [[appendToInvertedIndex]])
    * pivoted to one row per doc with (_tf_i, _df_i) per term of
    * `terms` (df for idf scoring — only ever read under a tf > 0
    * guard, so per-doc is safe), plus the corrected-summed-stats
    * (N, total_len) plan constants and the GLOBAL per-term
    * collection frequencies for language-model smoothing. Factored
    * so every index-served ranker scores IDENTICAL inputs.
    */
  private def pivotedFromIndex(spark: SparkSession, path: String,
      terms: Seq[String],
      asOf: Long = Long.MaxValue): (DataFrame, Column, Column, () => Map[String, Long]) = {
    // ONE manifest fingerprint feeds both the tombState key and the
    // stats key: ts and the cached stats must describe the SAME
    // index state, or a commit racing this serve could file
    // old-state values under a new-state key
    val tSig = ManifestOps.dirSig(spark, s"$path/tombstones")
    val ts = tombState(spark, path, asOf, tSig)
    // the stats head + stale-stats probe are per-index-state, not
    // per-query — cached on the same fingerprint discipline as
    // [[tombState]] (plus the stats dir, which a REBUILD overwrites
    // without touching a manifest)
    val (nDocs, totLen, nBuckets, staleN, staleLen) =
      ManifestOps.cached(statsCache,
        ManifestOps.cacheKey(ManifestOps.tokenOf(spark), asOf, path, tSig,
          ManifestOps.dirSig(spark, s"$path/stats"))) {
          val st = committedRows(spark.read.parquet(s"$path/stats"), ts)
            .agg(sum(col("n_docs")).as("_n"),
              sum(col("total_len")).as("_len"),
              max(col("n_buckets")).as("_nb")).head()
          val nb = st.getAs[Int]("_nb")
          // superseded docs still ride in the summed stats rows —
          // subtract their (1, dl) back out (bounded doclens read;
          // (0, 0) when the index has never seen a re-ingest)
          val (sn, sl) = staleStats(spark, path, nb, ts)
          (st.getAs[Long]("_n"), st.getAs[Long]("_len"), nb, sn, sl)
        }
    // bucket of each query term via the SAME hash expression the
    // build used — the literal-only tree is evaluated driver-side
    // (Catalyst eval of the identical Murmur3 expression), which
    // replaces the per-serve T-row Spark job the old `terms.toDF`
    // formulation paid
    val buckets = terms.map(termBucket(_, nBuckets)).distinct
    val postings = liveRows(
      spark.read.parquet(s"$path/postings")
        .filter(col("bucket").isin(buckets: _*) &&
          col("term").isin(terms: _*)),
      ts)
    val dfs = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("_df"), sum(col("tf")).as("_cf"))
    val pivots = terms.zipWithIndex.flatMap { case (t, i) => Seq(
      sum(when(col("term") === t, col("tf"))).as(s"_tf$i"),
      max(when(col("term") === t, col("_df"))).as(s"_df$i")) }
    val perDoc = postings.join(broadcast(dfs), "term")
      .groupBy(col("id"), col("dl"))
      .agg(pivots.head, pivots.tail: _*)
    val nD = lit(nDocs - staleN).cast("double")
    val lenD = lit(totLen - staleLen).cast("double")
    // global per-term collection frequency as a T-row bounded
    // collect: cf is a CORPUS constant per term (unlike df, which
    // only ever appears under a tf > 0 guard, cf feeds the
    // background probability of docs that do NOT contain the term —
    // a per-doc pivot would silently zero those contributions).
    // LAZY: only the language-model rankers read cf; the BM25 family
    // discards it, and eager evaluation charged every BM25 serve a
    // whole postings-scan job for a value it never used.
    val cfByTerm = () => dfs.select(col("term"), col("_cf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (perDoc, nD, lenD, cfByTerm)
  }

  /** Top-k DIRICHLET QUERY-LIKELIHOOD retrieval served from a stored
    * index (Zhai & Lafferty, SIGIR 2001) — a second ranking family
    * over the SAME postings, exercising what BM25 does not:
    * collection frequency. score(d) = Σ_t ln((tf + μ·cf_t/C) /
    * (dl + μ)) over the query terms in fixed order, where C is the
    * corpus token count from the summed stats sidecar; terms absent
    * from the corpus (cf = 0, background probability undefined)
    * contribute 0 by convention. The candidate set is docs matching
    * ≥ 1 query term — the standard IR serving convention for an
    * inverted index (only probed postings are read), stated here as
    * a deliberate RANKING CONVENTION, not a no-loss guarantee: all
    * score terms are negative, so a short unmatched doc can in
    * principle outscore a long matched one — the oracle replays the
    * same convention (ADVICE r18). Scores are NEGATIVE log
    * likelihoods rounded 6 dp; ties on ascending id.
    */
  def qlTopKFromIndex(spark: SparkSession, path: String, idCol: String,
      terms: Seq[String], k: Int, mu: Double = 1000.0,
      asOfGen: Long = Long.MaxValue): DataFrame = {
    require(terms.nonEmpty, "QL needs at least one query term")
    require(mu > 0.0, "mu must be positive")
    val (perDoc, _, lenD, cfThunk) =
      pivotedFromIndex(spark, path, terms, asOfGen)
    val cfByTerm = cfThunk()
    val dlD = col("dl").cast("double")
    val score: Column = terms.indices.map { i =>
      val tf = coalesce(col(s"_tf$i"), lit(0L)).cast("double")
      val cf = lit(cfByTerm.getOrElse(terms(i), 0L)).cast("double")
      when(cf > lit(0.0),
        log((tf + lit(mu) * cf / lenD) / (dlD + lit(mu))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    perDoc
      .withColumn("score", round(score, 6))
      .select(col("id").as(idCol), col("dl"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** `asOfGen` = TIME-TRAVEL READ ([[indexHistory]] lists the clock):
    * serve the index AS OF that commit generation — appends and
    * deletes committed later are invisible, reproducing the exact
    * corpus state a past training run retrieved from (the
    * data-lineage hook: pin the generation in the run's metadata,
    * re-serve it forever, q242 gates it). Default = latest.
    */
  def bm25TopKFromIndex(spark: SparkSession, path: String, idCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      asOfGen: Long = Long.MaxValue): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val (perDoc, nD, lenD, _) =
      pivotedFromIndex(spark, path, terms, asOfGen)
    val avgdl = lenD / nD
    val dlD = col("dl").cast("double")
    val score: Column = terms.indices.map { i =>
      val tf = coalesce(col(s"_tf$i"), lit(0L)).cast("double")
      val dfD = col(s"_df$i").cast("double")
      val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
      when(tf > lit(0.0),
        (idf * (tf * (lit(k1) + lit(1.0)))) /
          (tf + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (dlD / avgdl))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    perDoc
      .withColumn("score", round(score, 6))
      .filter(col("score") > lit(0.0))
      .select(col("id").as(idCol), col("dl"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
