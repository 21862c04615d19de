package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType}
import graft.core.OpCache.TrackedPersist

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`), LLM-pipeline extension (SURVEY.md §2.5).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k via crossJoin + window.
  *    O(|Q|·|C|) similarity evaluations; the baseline and the oracle.
  *  - [[lshTopK]] — random-hyperplane LSH: vectors are bucketed by the
  *    sign pattern of `p` fixed hyperplane projections, candidates are
  *    only pairs sharing a bucket, re-ranked exactly. At 100 TB the
  *    brute-force crossJoin is impossible (10¹⁰ × 10³ pairs); LSH makes
  *    candidate generation a hash-partitioned equi-join on the bucket
  *    key — one shuffle each side, candidates ∝ bucket occupancy, and
  *    recall tunable via multi-probe/band count.
  *
  * All vector math is higher-order-function `Column` expressions
  * (zip_with/aggregate) — codegen-friendly, no UDFs.
  *
  * Caching contract: the exact paths ([[bruteForceTopK]] with
  * `exact = true`, [[ivfTopKSeeded]], [[quantizedTopK]]) persist
  * intermediate frames (norms, the slim candidate pass) because each
  * feeds several consumers of one returned plan. The blocks cannot be
  * unpersisted here — the result is lazy and the final action happens
  * at the caller — so every persist is registered with
  * [[graft.core.OpCache]]: a long-lived session calls
  * `OpCache.release()` once each result is materialized, freeing
  * exactly the operator-internal blocks (the bench does this between
  * queries). Unreleased blocks are MEMORY_AND_DISK — they spill
  * rather than OOM, but disk fills eventually.
  */
object Similarity {

  /** Σ aᵢ·bᵢ over float vectors — native loop kernel
    * (graft.functions.DotProduct); [[dotHof]] is the bit-identical
    * composable formulation it is tested against.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotExactExpression.dotFast(a, b)

  /** Composable formulation of [[dot]] (works on any numeric arrays). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, v) => s + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(0.0)
  }

  /** Order-independent dot product: each float·float product (exact in
    * double) is quantized to scale 12 and exact-summed, so the result
    * is identical at any parallelism and on any engine — the
    * oracle-parity twin of [[dot]] (same rationale as
    * [[graft.core.Exact]]). Runs as a native kernel
    * ([[graft.functions.DotExact]]); [[dotExactHof]] is the
    * formulation it is tested bit-identical against.
    */
  def dotExact(a: Column, b: Column): Column =
    graft.functions.DotExactExpression.dotExact(a, b)

  /** Composable-expression formulation of [[dotExact]]. */
  def dotExactHof(a: Column, b: Column): Column =
    aggregate(
      // precision must stay far below Spark's 38 cap: DECIMAL(28,12) +
      // DECIMAL(18,12) adds at (29,12) — if the result hit precision 38
      // Spark would silently drop scale and round every step
      zip_with(a, b, (x, y) =>
        (x.cast("double") * y.cast("double")).cast(DecimalType(18, 12))),
      lit(BigDecimal(0)).cast(DecimalType(28, 12)),
      (s, v) => (s + v).cast(DecimalType(28, 12))).cast("double")

  /** Deterministic cosine built on [[dotExact]]. */
  def cosineExact(a: Column, b: Column): Column = {
    val den = sqrt(dotExact(a, a)) * sqrt(dotExact(b, b))
    when(den > 0, dotExact(a, b) / den).otherwise(0.0)
  }

  /** Exact top-k neighbors for each query vector against the corpus.
    * Both frames need (`idCol`, `vecCol`). Ties broken by corpus id —
    * deterministic at any parallelism. The similarity is rounded to
    * `roundDp` BEFORE ranking so rank order is reproducible across
    * engines (float dot products agree to ~1e-12; ranking on raw
    * doubles would let a 1-ulp difference swap neighbors).
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      roundDp: Int = 6,
      exact: Boolean = false): DataFrame = {

    // norms are precomputed per vector (|Q|+|C| sqrt's), not per pair
    // (|Q|·|C|) — 3× less vector math on the crossJoin hot path; in
    // exact mode they're persisted too, since the pair pass and the
    // survivor re-attach would otherwise each run the decimal-exact
    // norm scan
    def d(a: Column, b: Column) = if (exact) dotExact(a, b) else dot(a, b)
    def persistIfExact(df: DataFrame) =
      if (exact) df.persistTracked else df
    val q = persistIfExact(queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
      sqrt(d(col(vecCol), col(vecCol))).as("_qn")))
    val c = persistIfExact(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      sqrt(d(col(vecCol), col(vecCol))).as("_cn")))
    val den = col("_qn") * col("_cn")
    val pairs = q.join(c, col("query_id") =!= col("neighbor_id"))
    if (exact) exactTopKRefine(q, c, pairs, k, roundDp)
    else {
      val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
      val cos = when(den > 0, dot(col("_qv"), col("_cv")) / den).otherwise(0.0)
      pairs.withColumn("sim", if (roundDp < 0) cos else round(cos, roundDp))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    }
  }

  /** Hard-negative mining for contrastive/embedding training: for
    * each anchor, the k most cosine-similar corpus vectors with a
    * DIFFERENT label — "looks like the anchor but isn't" is exactly
    * the negative that teaches a contrastive model its decision
    * boundary (in-batch random negatives are mostly easy and carry
    * little gradient). Same decimal-exact epsilon-band refine as
    * [[bruteForceTopK]] exact mode, with the label-mismatch predicate
    * fused into the pair pass — label filtering AFTER a plain top-k
    * would under-fill k whenever same-label vectors crowd the
    * neighborhood (precisely the clustered case hard negatives are
    * for). This is the |A|×|C| exact baseline; at corpus scale
    * restrict the pair pass per IVF cell ([[ivfTopKSeeded]]'s probe
    * machinery) and mine within probed cells.
    */
  def hardNegatives(
      anchors: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      roundDp: Int = 6): DataFrame = {
    val q = anchors.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        sqrt(dotExact(col(vecCol), col(vecCol))).as("_qn"),
        col(labelCol).as("_ql"))
      .persistTracked
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
        sqrt(dotExact(col(vecCol), col(vecCol))).as("_cn"),
        col(labelCol).as("_cl"))
      .persistTracked
    val pairs = q.join(c,
      col("query_id") =!= col("neighbor_id") && col("_ql") =!= col("_cl"))
    exactTopKRefine(q, c, pairs, k, roundDp)
  }

  /** Decimal-exact top-k over a candidate-pair frame — the staged
    * epsilon-band refine shared by [[bruteForceTopK]] exact mode and
    * [[ivfTopKSeeded]]. Rank with the cheap double cosine, keep
    * everything within a band of the kth fast sim, score only the
    * survivors decimal-exactly. Soundness: |double−exact| ≤ ε₀ ≈ 1e-11
    * per cosine (bounded term count), so any pair in the exact top-k
    * has fast ≥ kth_fast − 2ε₀ > kth_fast − 1e-9 — even mass ties at
    * the cutoff (duplicate embeddings) ALL survive; output is identical
    * to scoring every pair exactly, at a small fraction of the decimal
    * work.
    *
    * The staging is engineered to keep Spark's WindowGroupLimit
    * pushdown: a pure `rank === k` filter lets every map task keep only
    * k rows per query BEFORE the window shuffle, while OR-ing the band
    * predicate into the rank filter would disable the rewrite and
    * shuffle+sort every pair (~2× whole-query cost, measured). So:
    * (A) a slim vector-free pass persists (query, neighbor, fast);
    * (B) the kth fast sim per query comes from the group-limited rank;
    * (C) the band filter is a broadcast join + filter, no window;
    * (D) vectors re-attach to the tiny survivor set for the
    * decimal-exact score.
    *
    * @param q     unique query rows (query_id, _qv, _qn)
    * @param c     unique corpus rows (neighbor_id, _cv, _cn)
    * @param pairs candidate pairs carrying all six columns
    */
  private def exactTopKRefine(
      q: DataFrame,
      c: DataFrame,
      pairs: DataFrame,
      k: Int,
      roundDp: Int): DataFrame = {

    val den = col("_qn") * col("_cn")
    val fast = when(den > 0, dot(col("_qv"), col("_cv")) / den).otherwise(0.0)
    val slim = pairs.withColumn("_sim_fast", fast)
      .select("query_id", "neighbor_id", "_sim_fast")
      .persistTracked
    val wFast = Window.partitionBy("query_id")
      .orderBy(col("_sim_fast").desc, col("neighbor_id"))
    val kth = slim.withColumn("_rn", row_number().over(wFast))
      .filter(col("_rn") === k)
      .select(col("query_id"), col("_sim_fast").as("_kth_fast"))
    // left join: a query with < k candidates has no kth row — keep all
    // its candidates
    val surv = slim.join(broadcast(kth), Seq("query_id"), "left")
      .filter(col("_kth_fast").isNull ||
        col("_sim_fast") >= col("_kth_fast") - 1e-9)
      .select("query_id", "neighbor_id")
    val cosE = when(den > 0, dotExact(col("_qv"), col("_cv")) / den).otherwise(0.0)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(surv.join(q, "query_id")), "neighbor_id")
      .withColumn("sim", if (roundDp < 0) cosE else round(cosE, roundDp))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Deterministic pseudo-random unit hyperplanes (fixed seed — the
    * plan must be identical across runs and executors).
    */
  private def hyperplanes(dim: Int, p: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(p)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-pattern LSH bucket id for a vector: bit i = sign(v·hᵢ). */
  def lshBucket(vec: Column, dim: Int, planes: Int, seed: Long = 42L): Column = {
    require(planes >= 1 && planes <= 63,
      s"planes must be 1..63 (bucket bits in one long), got $planes")
    val hp = hyperplanes(dim, planes, seed)
    hp.zipWithIndex.map { case (h, i) =>
      val proj = aggregate(
        zip_with(vec, lit(h), (x, w) => x.cast("double") * w),
        lit(0.0), (s, v) => s + v)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** IVF-style ANN: assign every corpus vector to its nearest of
    * `nCentroids` fixed centroids (deterministic pseudo-random, unit
    * Gaussian — a k-means refinement would sharpen cells but needs a
    * training pass); queries probe their `nProbe` closest cells and
    * re-rank those candidates exactly.
    *
    * Scale shape vs [[lshTopK]]: candidate count is tunable directly
    * (nProbe/nCentroids · |C| on average) and cells can be written as
    * partitioned parquet (`partitionBy(cell)`) so a probe reads only
    * nProbe partitions — the classic IVF index layout, expressed as
    * ordinary columns.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      seed: Long = 7L,
      trained: Option[Array[Array[Double]]] = None): DataFrame = {

    // `trained` plugs in kmeansCentroids output (sharper cells, better
    // recall at the same nProbe); default is the training-free
    // deterministic Gaussian layout
    val cents = trained.getOrElse(hyperplanes(dim, nCentroids, seed))
    def centSim(vec: Column, c: Array[Double]): Column =
      aggregate(zip_with(vec, lit(c), (x, w) => x.cast("double") * w),
        lit(0.0), (s, v) => s + v)
    // argmax cell per corpus vector: pairwise when()-reduce over the
    // fixed centroid list — a flat codegen'd expression, no shuffle, no
    // constructed-struct field extraction (Spark 4 loses field names of
    // structs built inside array()); ties → lowest cell via >=
    def argmaxCell(vec: Column): Column =
      cents.zipWithIndex.map { case (cv, i) => (centSim(vec, cv), lit(i)) }
        .reduce[(Column, Column)] { case ((s1, i1), (s2, i2)) =>
          (when(s1 >= s2, s1).otherwise(s2), when(s1 >= s2, i1).otherwise(i2))
        }._2

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      argmaxCell(col(vecCol)).as("_cell"))
    // queries rank all cells and probe the top nProbe — an array of
    // struct(-sim, cell) over the centroid literals, array_sort
    // (= sim desc, ties → lowest cell), slice, explode: a pure
    // map-side projection, no |Q|×nCentroids window shuffle (the
    // [[ivfTopKSeeded]] probe shape)
    val probeArr = array(cents.zipWithIndex.map { case (cv, i) =>
      struct((-centSim(col(vecCol), cv)).as("_negs"), lit(i).as("_cell"))
    }.toIndexedSeq: _*)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        explode(slice(array_sort(probeArr), 1, nProbe)).as("_pc"))
      .select(col("query_id"), col("_qv"), col("_pc._cell").as("_cell"))

    // each corpus vector lives in exactly ONE cell (argmax assignment),
    // so (query, neighbor) pairs are already unique — no dedup shuffle
    val scored = q.join(c, Seq("_cell")).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("_qv"), col("_cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** IVF ANN with DATA-DERIVED coarse centroids: cells are actual
    * corpus vectors (`seeds`), assignment is argmax cosine over seeds,
    * and both assignment and re-ranking use the decimal-exact dot —
    * so unlike [[ivfTopK]] (engine-seeded random centroids) the whole
    * plan is pure relational algebra over data and has a DuckDB oracle
    * twin. At 100 TB the seeds come from [[kmeansCentroids]] or a
    * deterministic sample; the assignment/probe/rerank machinery is
    * identical. Scale shape: seeds collect to the driver and enter the
    * plan as literals (k×dim is model-sized — the same move as
    * [[lshTopKSeeded]]'s hyperplanes), so assignment and probe ranking
    * are map-side array math with no fanned-frame shuffle; the probe
    * join shuffles by cell — candidate volume ∝ nProbe/|seeds|, with
    * hot cells handled by AQE skew splitting.
    *
    * EAGER on the seed side (see [[assignCells]]): the seed frame is
    * collected at plan-build time (memoized per canonical plan) and
    * must be non-empty; queries/corpus stay lazy.
    */
  def ivfTopKSeeded(
      queries: DataFrame,
      corpus: DataFrame,
      seeds: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int): DataFrame = {

    val s = seeds.select(col(idCol).as("_cell"), col(vecCol).as("_sv"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("_sn"))
    // the seed set is model-sized — one driver collect serves both the
    // corpus assignment and the query probes as literal expressions
    val model = collectSeeds(s)

    // the decimal-exact self-dot norms feed three consumers each
    // (assignment, probe join, survivor re-attach) — persist so the
    // exact norm pass runs once per vector, not once per consumer
    val cN = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("_cn"))
      .persistTracked
    val qN = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("_qn"))
      .persistTracked

    val withCell = cN.join(
      assignCellsFromModel(cN, model, "neighbor_id")
        .withColumnRenamed("cell", "_cell"),
      "neighbor_id")

    // queries probe their nProbe closest cells — per query, an array
    // of struct(-exact_sim, cell) over the seed LITERALS, array_sort
    // (= sim desc, ties → lowest cell, matching the oracle's ORDER BY
    // csim DESC, cell), slice to nProbe, explode. A pure map-side
    // projection of qN: no |Q|×|seeds| shuffle, no window, and the
    // query vectors never ride an exchange just to be ranked.
    def qden(i: Int) = col("_qn") * lit(model(i).norm)
    val probeArr = array(model.indices.map { i =>
      struct(
        (-when(qden(i) > 0, dotExact(col("_qv"), lit(model(i).vec)) / qden(i))
          .otherwise(0.0)).as("_negs"),
        lit(model(i).cell).as("_cell"))
    }.toIndexedSeq: _*)
    val probes = qN
      .select(col("query_id"), col("_qv"), col("_qn"),
        explode(slice(array_sort(probeArr), 1, nProbe)).as("_pc"))
      .select(col("query_id"), col("_qv"), col("_qn"), col("_pc._cell").as("_cell"))

    // candidates = probed cells' members; exact top-k via the shared
    // banded refine (decimal work only on the handful of survivors)
    val pairs = probes.join(withCell, Seq("_cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "_qv", "_qn", "neighbor_id", "_cv", "_cn")
    exactTopKRefine(qN, cN, pairs, k, roundDp = -1)
  }

  /** The persistable IVF index: every corpus vector's cell assignment
    * under the `seeds` coarse centroids — (idCol, cell) rows, exactly
    * [[assignCells]]. Build ONCE, write to parquet, query forever
    * with [[ivfTopKFromIndex]]: at 100 TB the assignment pass is a
    * full-corpus scan, and an ANN service must not pay it per query
    * batch. The assignment is a pure function of (vector, seeds) —
    * decimal-exact argmax, ties to the lowest cell — so a stored
    * index is bit-identical to what [[ivfTopKSeeded]] would assign
    * inline, and queries through it return IDENTICAL results (q104
    * gates that equivalence against q29's oracle).
    */
  def buildIvfIndex(
      corpus: DataFrame,
      seeds: DataFrame,
      idCol: String,
      vecCol: String): DataFrame =
    assignCells(corpus, seeds, idCol, vecCol)

  /** [[ivfTopKSeeded]] with the corpus-assignment stage replaced by a
    * STORED index frame ([[buildIvfIndex]] read back from parquet).
    * Per query batch the work is: probe ranking over the seed
    * literals (map-side), a join against the index-pruned corpus
    * slice, and the shared banded exact refine — the corpus is
    * touched only for vectors in probed cells (at scale: cluster the
    * corpus file layout by cell — [[graft.operators.Layout]] — and
    * the candidate read prunes to nProbe/|seeds| of the files).
    */
  def ivfTopKFromIndex(
      queries: DataFrame,
      corpus: DataFrame,
      index: DataFrame,
      seeds: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int): DataFrame = {

    val s = seeds.select(col(idCol).as("_cell"), col(vecCol).as("_sv"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("_sn"))
    val model = collectSeeds(s)

    val cN = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("_cn"))
      .persistTracked
    val qN = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("_qn"))
      .persistTracked

    // the stored assignment replaces assignCellsFromModel — the one
    // structural difference from the inline operator
    val withCell = cN.join(
      index.select(col(idCol).as("neighbor_id"), col("cell").as("_cell")),
      "neighbor_id")

    def qden(i: Int) = col("_qn") * lit(model(i).norm)
    val probeArr = array(model.indices.map { i =>
      struct(
        (-when(qden(i) > 0, dotExact(col("_qv"), lit(model(i).vec)) / qden(i))
          .otherwise(0.0)).as("_negs"),
        lit(model(i).cell).as("_cell"))
    }.toIndexedSeq: _*)
    val probes = qN
      .select(col("query_id"), col("_qv"), col("_qn"),
        explode(slice(array_sort(probeArr), 1, nProbe)).as("_pc"))
      .select(col("query_id"), col("_qv"), col("_qn"), col("_pc._cell").as("_cell"))

    val pairs = probes.join(withCell, Seq("_cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "_qv", "_qn", "neighbor_id", "_cv", "_cn")
    exactTopKRefine(qN, cN, pairs, k, roundDp = -1)
  }

  /** Database-friendly random projection (Achlioptas, "Database-
    * friendly random projections: Johnson-Lindenstrauss with binary
    * coins", JCSS 2003): project `inDim`-dim embeddings to `outDim`
    * dims with a ±1 sign matrix — the JL guarantee preserves pairwise
    * distances within (1±ε) w.h.p. at outDim = O(log n / ε²), which
    * is the cheap pre-step before ANN/clustering when the raw
    * embedding width dominates shuffle volume (a 64→16 projection
    * cuts every downstream vector shuffle 4×).
    *
    * Deterministic and ORACLE-REPLAYABLE by construction: sign(i,j) =
    * +1 iff the first hex digit of md5("i:j") is even (md5 is
    * bit-identical in every engine), and each output component is
    * the decimal-exact signed sum ([[dotExact]] against the ±1f
    * literal row — the q17 parity mechanism), so projected vectors
    * are bit-identical at any parallelism and across engines. Scale
    * shape: pure map-side projection, sign rows are plan literals
    * (outDim×inDim bytes of model, not data).
    */
  def randomProjectExact(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      inDim: Int,
      outDim: Int): DataFrame = {
    require(inDim >= 1 && outDim >= 1, s"dims must be positive: $inDim → $outDim")
    val cols = (0 until outDim).map { j =>
      dotExact(col(vecCol), lit(projectionSignRow(inDim, j))).as(s"p$j")
    }
    df.select(col(idCol) +: cols: _*)
  }

  /** Row j of the ±1 projection matrix: sign(i,j) from md5("i:j"). */
  private[graft] def projectionSignRow(inDim: Int, j: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(inDim) { i =>
      val h = md.digest(s"$i:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first hex digit = high nibble of byte 0; +1 when even
      if ((((h(0) >> 4) & 0xF) & 1) == 0) 1.0f else -1.0f
    }
  }

  /** Lloyd's k-means over an embedding column, returning k×dim centroid
    * arrays — the training pass that sharpens [[ivfTopK]]/
    * [[ivfTopKSeeded]] cells. Each iteration: assign every vector to
    * its nearest current centroid (centroids are broadcast literals —
    * zero shuffle), then recompute cell means with ONE partial-
    * aggregated shuffle (posexplode to (cell, pos, x), groupBy avg).
    * Only the k×dim centroid state (model metadata, not data) is
    * collected to the driver per iteration. Deterministic: init = the
    * k lowest-id vectors; assignment ties resolve to the lowest cell.
    * Empty cells keep their previous centroid.
    */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): Array[Array[Double]] = {

    // iterative training re-reads the vectors every iteration (plus
    // the init scan) — cache the projection once so iterations hit
    // memory, not the source scan. Training is EAGER (the model comes
    // back as a driver array), so the cache is released before
    // returning — no OpCache round-trip needed.
    val vecs = corpus.select(col(idCol).as("_vid"), col(vecCol).as("_v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: Array[Array[Double]] = vecs.orderBy(col("_vid")).limit(k)
        .select(col("_v")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      for (_ <- 0 until iters) {
        val assigned = vecs.select(
          nearestCell(col("_v"), cents).as("_cell"),
          posexplode(col("_v")).as(Seq("_p", "_x")))
        val means = assigned.groupBy("_cell", "_p")
          .agg(avg(col("_x").cast("double")).as("_m"))
          .collect()
        val next = cents.map(_.clone())
        means.foreach { r =>
          next(r.getAs[Int]("_cell"))(r.getAs[Int]("_p")) = r.getAs[Double]("_m")
        }
        cents = next
      }
      cents
    } finally vecs.unpersist(false)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the corpus into |seeds| cells (argmax
    * exact cosine to the seed vectors — at 100 TB the seeds come from
    * [[kmeansCentroids]] on a sample), then WITHIN each cell drop
    * every vector that has a smaller-id cell-mate with cosine ≥
    * `threshold`. Returns (`idCol`, cell, is_kept) for the whole
    * corpus — survivors are the `is_kept` rows.
    *
    * Scale shape: seeds become driver-collected literals
    * (model-sized); assignment is the epsilon-banded map-side
    * exact-argmax of [[assignCellsFromModel]] (fast double cosines as
    * an array, decimal work only within 1e-9 of each vector's
    * `array_max`); the pair pass is a self-equi-join ON THE CELL
    * KEY — candidate volume ∝ Σ|cell|², never |C|², with hot cells
    * split by AQE. The similarity threshold runs double-prefiltered at
    * `threshold`−1e-6, decimal-exact on survivors (q26 pattern: the
    * two differ by ≤ ~1e-11, so no qualifying pair can be lost).
    */
  /** Exact-argmax cosine cell assignment against seed vectors:
    * returns (`idCol`, cell = seed id). Seeds become literals
    * ([[assignCellsFromModel]]): the fast double cosines to every seed
    * are a map-side array, `array_max` bands them at 1e-9, and
    * decimal-exact work runs only on band survivors; ties resolve to
    * the LOWEST cell id. Shared by [[semDedup]] and the
    * cell-diagnostic queries.
    *
    * EAGER on the seed side: the seed frame is collected (memoized
    * per canonical plan) AT PLAN-BUILD TIME, and an empty seed frame
    * throws immediately — callers cannot construct the plan before
    * seed data exists. The corpus side stays fully lazy.
    */
  def assignCells(
      corpus: DataFrame,
      seeds: DataFrame,
      idCol: String,
      vecCol: String): DataFrame =
    assignCellsFrom(
      corpus.select(col(idCol), col(vecCol).as("_cv"),
        sqrt(dotExact(col(vecCol), col(vecCol))).as("_cn")),
      seeds.select(col(idCol).as("_cell"), col(vecCol).as("_sv"),
        sqrt(dotExact(col(vecCol), col(vecCol))).as("_sn")),
      idCol)

  /** One collected seed: (cell id, vector, engine-computed exact norm).
    * The norm is collected rather than recomputed on the driver so the
    * literal is bit-identical to what `sqrt(dotExact(v,v))` yields in
    * the plan — driver-side BigDecimal arithmetic could round casts
    * differently.
    */
  private case class Seed(cell: Any, vec: Array[Float], norm: Double)

  /** Session-scoped memo of collected seed models, keyed by the seed
    * frame's CANONICALIZED analyzed plan (expression ids normalized;
    * file relations compare by root path, so two separate
    * `spark.read.parquet(p).filter(...)` constructions of the same
    * seed frame share one entry). Repeated operator calls over the
    * same seed set — the common session shape: assignment, purity
    * diagnostics and dedup all seeded from one frame — then pay ONE
    * driver collect job instead of one per call. Models are
    * model-sized by contract, so the map stays tiny; a 64-entry cap
    * bounds the pinned plan trees in pathological many-model
    * sessions. Staleness contract (same as Spark's own plan-keyed
    * dataframe cache): rewriting the seed frame's BACKING FILES in
    * place between calls serves the stale model — call
    * [[clearSeedModels]] after in-place input mutation.
    */
  private val seedModelCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession,
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan), Array[Seed]]()

  /** Drop every memoized seed model (see [[seedModelCache]] staleness
    * contract).
    */
  def clearSeedModels(): Unit = seedModelCache.clear()

  /** Memoized seed-model count (diagnostics/specs). */
  private[graft] def seedModelsCached: Int = seedModelCache.size

  /** Collect a model-sized seed frame (`_cell`,`_sv`,`_sn`) to the
    * driver, ordered by cell id (the plan must not depend on collect
    * order). Same move as [[lshTopKSeeded]]'s hyperplane seeds.
    * Memoized per canonical plan — see [[seedModelCache]].
    */
  private def collectSeeds(s: DataFrame): Array[Seed] = {
    if (seedModelCache.size > 64) seedModelCache.clear()
    seedModelCache.computeIfAbsent(
      (s.sparkSession, s.queryExecution.analyzed.canonicalized), _ => {
        val rows = s.orderBy("_cell").collect().map { r =>
          Seed(r.get(0), r.getSeq[Float](1).toArray, r.getDouble(2))
        }
        require(rows.nonEmpty, "seed frame is empty — need at least one cell seed")
        rows
      })
  }

  /** [[assignCells]] over a pre-normed corpus frame (`idCol`,`_cv`,
    * `_cn`) and pre-normed seeds (`_cell`,`_sv`,`_sn`) — lets callers
    * persist the corpus norm pass when it feeds more consumers than
    * the assignment.
    */
  private def assignCellsFrom(cN: DataFrame, s: DataFrame, idCol: String): DataFrame =
    assignCellsFromModel(cN, collectSeeds(s), idCol).select(col(idCol), col("cell"))

  /** The assignment engine: seeds enter the plan as LITERALS (they are
    * model-sized and already on the driver), so the per-vector fast
    * max is `array_max` over a map-side array — no |corpus|×|seeds|
    * fanned frame ever rides a shuffle, and the corpus vectors never
    * leave their map task. Stages, all map-side until the last:
    *  (a) `_fa` = array of fast double cosines to every seed literal;
    *  (b) `array_max(_fa)` — the per-vector fast max, zero exchanges
    *      (the [[kmeansCentroidsExact]] argmin pattern);
    *  (c) posexplode + band filter keeps seeds within 1e-9 of the max
    *      (≫ 2ε₀ ≈ 2e-11 double-vs-exact error, so the true exact-
    *      argmax seed always survives — usually exactly one row);
    *  (d) the surviving row's decimal-exact sim dispatches through a
    *      flat when() chain on the exploded position — each decimal
    *      kernel appears exactly once (a nested reduce would inline
    *      them up to 2^k times; CSE excludes lambdas);
    *  (e) winner via groupBy(id).min(struct(−sim, cell)): map-side
    *      combinable, ties → LOWEST cell id under the id type's own
    *      ordering (negating the SIM — always a double — instead of
    *      the cell keeps string/any-typed cell ids working; csim is
    *      never −0.0, it is a decimal-quotient or the literal 0.0),
    *      and the only exchange in the whole assignment carries
    *      (id, sim, cell) — ~24 bytes/row with ~1 row per id, not
    *      vector payloads.
    */
  private def assignCellsFromModel(
      cN: DataFrame,
      model: Array[Seed],
      idCol: String): DataFrame = {

    def den(i: Int) = col("_cn") * lit(model(i).norm)
    def fastSim(i: Int) =
      when(den(i) > 0, dot(col("_cv"), lit(model(i).vec)) / den(i)).otherwise(0.0)
    def exactSim(i: Int) =
      when(den(i) > 0, dotExact(col("_cv"), lit(model(i).vec)) / den(i)).otherwise(0.0)
    val csimByPos = (1 until model.length).foldLeft(
      when(col("_pos") === 0, exactSim(0))) {
      case (acc, i) => acc.when(col("_pos") === i, exactSim(i))
    }
    val cellByPos = (1 until model.length).foldLeft(
      when(col("_pos") === 0, lit(model(0).cell))) {
      case (acc, i) => acc.when(col("_pos") === i, lit(model(i).cell))
    }
    cN.select(col(idCol), col("_cv"), col("_cn"),
        array(model.indices.map(fastSim).toIndexedSeq: _*).as("_fa"))
      .select(col(idCol), col("_cv"), col("_cn"),
        array_max(col("_fa")).as("_fmax"),
        posexplode(col("_fa")).as(Seq("_pos", "_fsim")))
      .filter(col("_fsim") >= col("_fmax") - 1e-9)
      .select(col(idCol), csimByPos.as("_csim"), cellByPos.as("_cell"))
      .groupBy(idCol)
      .agg(min(struct((-col("_csim")).as("_negs"), col("_cell").as("_c"),
        col("_csim").as("_s"))).as("_m"))
      .select(col(idCol), col("_m._c").as("cell"), col("_m._s").as("_sim"))
  }

  /** Nearest seed WITH its exact cosine: (`idCol`, cell, sim DOUBLE —
    * the decimal-exact cosine, bit-identical cross-engine). The
    * [[assignCells]] machinery with the winning similarity kept —
    * the shape behind semantic benchmark decontamination (q147):
    * eval sets are MODEL-sized, so they ride as plan literals and
    * the whole nearest-benchmark scan is map-side until the one slim
    * argmax exchange.
    */
  def nearestSeed(
      corpus: DataFrame,
      seeds: DataFrame,
      idCol: String,
      vecCol: String): DataFrame =
    assignCellsFromModel(
      corpus.select(col(idCol), col(vecCol).as("_cv"),
        sqrt(dotExact(col(vecCol), col(vecCol))).as("_cn")),
      collectSeeds(seeds.select(col(idCol).as("_cell"), col(vecCol).as("_sv"),
        sqrt(dotExact(col(vecCol), col(vecCol))).as("_sn"))),
      idCol)
      .select(col(idCol), col("cell"), col("_sim").as("sim"))

  /** [[nearestSeed]] as a PURE PER-ROW PROJECTION — no groupBy, no
    * shuffle, no state: the shape that makes semantic
    * decontamination automatically STREAMING-capable (q149). All
    * |seeds| decimal-exact cosines evaluate as one array per row
    * (affordable because eval benchmarks are model-sized); argmax =
    * `array_position(array_max)` — first index on a tie, i.e. the
    * LOWEST seed id, identical to the batch `max(struct(sim,
    * −cell))` rule, so stream ≡ batch bit-for-bit. Prefer
    * [[nearestSeed]] for large seed counts (its fast-double band
    * skips most exact kernels); this path runs every exact kernel
    * every row.
    */
  def nearestSeedRowwise(
      corpus: DataFrame,
      seeds: DataFrame,
      idCol: String,
      vecCol: String): DataFrame = {
    val model = collectSeeds(seeds.select(col(idCol).as("_cell"), col(vecCol).as("_sv"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("_sn")))
    def den(i: Int) = col("_cn") * lit(model(i).norm)
    def exactSim(i: Int) =
      when(den(i) > 0, dotExact(col("_cv"), lit(model(i).vec)) / den(i)).otherwise(0.0)
    val cells = array(model.map(m => lit(m.cell)).toIndexedSeq: _*)
    corpus.select(col(idCol), col(vecCol).as("_cv"),
        sqrt(dotExact(col(vecCol), col(vecCol))).as("_cn"))
      .select(col(idCol),
        array(model.indices.map(exactSim).toIndexedSeq: _*).as("_sa"))
      .select(col(idCol),
        element_at(cells, array_position(col("_sa"), array_max(col("_sa"))).cast("int"))
          .as("cell"),
        array_max(col("_sa")).as("sim"))
  }

  /** SemDeDup (Abbas et al. 2023): assign every vector to its nearest
    * seed cell, then within each cell drop any vector that has a
    * smaller-id cell-mate at cosine ≥ `threshold`. Output: (`idCol`,
    * cell, is_kept) for the full corpus.
    *
    * CACHE LIFETIME: `cN` (normed corpus) and `withCell` are persisted
    * MEMORY_AND_DISK and intentionally NOT unpersisted — the operator
    * returns a lazy frame, so there is no point inside it where the
    * output is known to be materialized; an eager unpersist would
    * silently recompute both sides of the self-join (the exact cost
    * the persist exists to kill). Same policy as [[NearDup
    * .nearDupPairs]]'s shingle frame. Both are registered with
    * [[graft.core.OpCache]]; long-lived sessions issuing many
    * semDedup calls release them via `OpCache.release()` once the
    * result is materialized (the bench does, between queries).
    *
    * EAGER on the seed side (see [[assignCells]]): the seed frame is
    * collected at plan-build time (memoized per canonical plan) and
    * must be non-empty; the corpus side stays lazy.
    */
  def semDedup(
      corpus: DataFrame,
      seeds: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val (withCell, pairs) = cellPairsWithAssign(corpus, seeds, idCol, vecCol, threshold)
    val dropped = pairs
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("_dropped", lit(true))

    withCell.select(col(idCol), col("cell"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("_dropped").isNull.as("is_kept"))
  }

  /** The SemDeDup pair pass as a standalone generator: every
    * (id_a < id_b) pair that shares a cell AND clears the exact-cosine
    * threshold — the SCALE-SAFE semantic-pair source for ensemble
    * pipelines (candidate volume ∝ Σ|cell|², never |C|²; the q134
    * composition). Double-prefiltered at threshold−1e-6, decimal-exact
    * on survivors; same persist/cache lifetime policy as [[semDedup]].
    * Recall caveat BY DESIGN (Abbas et al. 2023): cross-cell pairs are
    * not candidates — the cell pass trades bounded work for a bounded
    * miss rate at the cell boundary, tuned via the seed count.
    */
  def cellPairs(
      corpus: DataFrame,
      seeds: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame =
    cellPairsWithAssign(corpus, seeds, idCol, vecCol, threshold)._2

  /** Shared engine of [[semDedup]]/[[cellPairs]]: (withCell frame —
    * (`idCol`, _cv, _cn, cell), persisted; qualifying pairs —
    * (id_a, id_b, cell)). Both outputs are lazy; `withCell` backs both
    * sides of the cell self-join so it materializes once.
    */
  private def cellPairsWithAssign(
      corpus: DataFrame,
      seeds: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): (DataFrame, DataFrame) = {
    require(!threshold.isNaN, "threshold must not be NaN (every comparison would be false)")

    val s = seeds.select(col(idCol).as("_cell"), col(vecCol).as("_sv"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("_sn"))
    val cN = corpus.select(col(idCol), col(vecCol).as("_cv"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("_cn"))
      .persistTracked

    val assign = assignCellsFrom(cN, s, idCol)

    // both sides of the cell self-join read this — materialize once
    val withCell = cN.join(assign, idCol)
      .persistTracked
    val a = withCell.select(col(idCol).as("id_a"), col("cell"),
      col("_cv").as("_va"), col("_cn").as("_na"))
    val b = withCell.select(col(idCol).as("id_b"), col("cell"),
      col("_cv").as("_vb"), col("_cn").as("_nb"))
    val den = col("_na") * col("_nb")
    val pairs = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("_fast", when(den > 0, dot(col("_va"), col("_vb")) / den).otherwise(0.0))
      .filter(col("_fast") >= threshold - 1e-6)
      .withColumn("_sim", when(den > 0, dotExact(col("_va"), col("_vb")) / den).otherwise(0.0))
      .filter(col("_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cell"))
    (withCell, pairs)
  }

  /** ORACLE-PARITY Lloyd's k-means: same contract as
    * [[kmeansCentroids]] (init = k lowest-id vectors, squared-euclidean
    * assignment with ties to the lowest cell, empty cells keep their
    * centroid) but every step is engine-reproducible:
    *  - distances quantize each (xᵢ−cᵢ)² term to DECIMAL(18,12) and
    *    exact-sum (order-independent, bit-identical in DuckDB —
    *    the [[dotExact]] strategy). Squares are TIE-FREE under the
    *    scale-12 cast: a decimal-cast tie requires the value to be
    *    odd/2¹³ exactly, and a square's dyadic denominator has an even
    *    exponent — so Spark's HALF_UP and DuckDB's HALF_EVEN casts
    *    always agree here (raw float VALUES can tie — 1625/2¹³ does in
    *    this corpus — which is why the means below avoid decimal);
    *  - cell means exact-sum the values as 2⁴³-scaled longs (float
    *    inputs with |x| < 2²⁰·ulp are exact multiples of 2⁻⁴³, checked
    *    per value — violations throw rather than silently drift) and
    *    divide as doubles, so the trained centroids are bit-identical
    *    at any parallelism and across engines. Long-sum headroom:
    *    |Σ| < n·2⁴³, fine through ~10⁶-vector training samples — the
    *    standard IVF recipe (train on a sample, assign the full corpus
    *    with the cheap double path).
    * Per-iteration cost is k×dim decimal ops per row. Use
    * [[kmeansCentroids]] when cross-engine bit parity of the model
    * itself is not required.
    */
  def kmeansCentroidsExact(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): Array[Array[Double]] = {

    val scale = 8796093022208.0 // 2^43
    // cache the vector projection once — each Lloyd's iteration (and
    // the init) otherwise re-runs the source scan. Training is EAGER
    // (the model is a driver array), so the cache is released in the
    // finally — no OpCache round-trip needed. Repartition to the
    // session parallelism first: the per-row work is CPU-bound
    // (k·d distances per row) and a small single-file training sample
    // otherwise runs every iteration in ONE task; every aggregate in
    // the loop is order-independent by the exact-arithmetic contract,
    // so the result is partitioning-invariant (spec-locked).
    val kmPar = corpus.sparkSession.sparkContext.defaultParallelism
    val vecs = corpus.select(col(idCol).as("_vid"), col(vecCol).as("_v"))
      .repartition(kmPar)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    var cents: Array[Array[Double]] = vecs.orderBy(col("_vid")).limit(k)
      .select(col("_v")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    for (_ <- 0 until iters) {
      // Exact argmin assignment as ONE native kernel
      // (graft.functions.CentroidExpressions.nearestExact, centroids
      // as a REFERENCE OBJECT): k·d scale-12 quantized flops per row,
      // ties to the lowest cell — the value the previous
      // epsilon-banded prune-then-refine pipeline converged to
      // (CentroidKernelSpec locks the equality), without its
      // posexplode/band-filter/argmin EXCHANGE: each Lloyd round is
      // now a single map-side projection into the one means shuffle.
      // Because the centroids ride in the `references` slot, every
      // iteration's plan codegens to byte-identical source and Janino
      // compiles the round ONCE (the literal-centroid HOF trees paid
      // re-analysis + a fresh whole-stage compile per round).
      val assigned = vecs.select(
        graft.functions.CentroidExpressions.nearestExact(col("_v"), cents)
          .as("_cell"),
        posexplode(col("_v")).as(Seq("_p", "_x")))
      val scaled = col("_x").cast("double") * scale
      val means = assigned.groupBy("_cell", "_p")
        .agg(
          (sum(floor(scaled).cast("long")).cast("double") / scale /
            count(lit(1))).as("_m"),
          max(when(scaled =!= floor(scaled), 1L).otherwise(0L)).as("_frac"))
        .collect()
      require(means.forall(_.getAs[Long]("_frac") == 0L),
        "kmeansCentroidsExact: input vectors are not exact multiples of " +
          "2^-43 — the integer-scaled exact mean would truncate. Use " +
          "kmeansCentroids (plain double means) for this data.")
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getAs[Int]("_cell"))(r.getAs[Int]("_p")) = r.getAs[Double]("_m")
      }
      cents = next
    }
    cents
    } finally vecs.unpersist(false)
  }

  /** Decimal-exact squared euclidean distance to a fixed centroid:
    * per-term quantization at scale 12 makes the value identical on any
    * engine ([[dotExact]] strategy; squares cannot tie at the cast —
    * even dyadic exponent — so HALF_UP vs HALF_EVEN never diverges).
    */
  private def distExactDecimal(vec: Column, c: Array[Double]): Column =
    aggregate(
      zip_with(vec, lit(c), (x, w) => {
        val t = x.cast("double") - w
        (t * t).cast(DecimalType(18, 12))
      }),
      lit(BigDecimal(0)).cast(DecimalType(28, 12)),
      (s, v) => (s + v).cast(DecimalType(28, 12)))

  /** Cell assignment for writing the IVF index as a partitioned layout
    * (`df.withColumn("cell", cellOf(...)).write.partitionBy("cell")`) —
    * a probe then reads only its nProbe partition directories.
    */
  def cellOf(vec: Column, cents: Array[Array[Double]]): Column =
    nearestCell(vec, cents)

  /** Index of the nearest centroid by squared euclidean distance, ties
    * to the lowest index. Argmin is array_min + first-occurrence
    * array_position so each of the k distance expressions appears
    * exactly ONCE in the plan — a pairwise when()-reduce re-embeds
    * every distance at every level (2^k expression growth; at k = 16
    * codegen never finishes).
    */
  private def nearestCell(vec: Column, cents: Array[Array[Double]]): Column =
    graft.functions.CentroidExpressions.nearest(vec, cents)

  /** The HOF formulation [[nearestCell]] is kernel-locked against
    * (CentroidKernelSpec) — kept as the executable spec of the
    * argmin/tie semantics.
    */
  private[operators] def nearestCellHof(vec: Column,
      cents: Array[Array[Double]]): Column = {
    val dists = array(cents.map { c =>
      aggregate(
        zip_with(vec, lit(c), (x, w) => { val t = x.cast("double") - w; t * t }),
        lit(0.0), (s, v) => s + v)
    }.toIndexedSeq: _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Sign-pattern LSH with DATA-DERIVED hyperplanes: bit i of the
    * bucket = [v·seedᵢ ≥ 0] with the decimal-exact dot, so the
    * bucketing (and hence the whole ANN query) is reproducible on any
    * engine — the oracle-checkable twin of [[lshTopK]]'s random
    * hyperplanes. Same scale shape: one equi-join on the bucket key,
    * candidates ∝ bucket occupancy.
    */
  def lshTopKSeeded(
      queries: DataFrame,
      corpus: DataFrame,
      seeds: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {

    val s = seeds.select(col(idCol).as("_sid"), col(vecCol).as("_sv"))
    val seedRows = s.orderBy("_sid").collect() // seed set is model-sized
    require(seedRows.nonEmpty && seedRows.length <= 63,
      s"seeded LSH needs 1..63 seed vectors (bucket bits in one long), got ${seedRows.length}")
    // Banded sign test: sign(exact dot) decides the bit, but the
    // decimal-exact dot only runs when the cheap double dot lies
    // within 1e-9·‖v‖·‖seed‖ of zero (≫ the ~1e-11 double-vs-exact
    // error, so outside the band sign(fast) == sign(exact)) — in
    // practice ~zero exact evaluations per vector instead of |seeds|.
    def bucket(vec: Column, nrm: Column): Column =
      seedRows.zipWithIndex.map { case (r, i) =>
        val arr = r.getSeq[Float](1).toArray
        val sv = lit(arr)
        val snD = math.sqrt(arr.map(x => x.toDouble * x.toDouble).sum)
        val fastD = dot(vec, sv)
        val bit = lit(1L << i)
        when(abs(fastD) > lit(1e-9 * snD) * nrm,
          when(fastD >= 0, bit).otherwise(lit(0L)))
          .otherwise(when(dotExact(vec, sv) >= 0, bit).otherwise(lit(0L)))
      }.reduce(_ + _)

    val qN0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("_qn"))
    val cN0 = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("_cn"))
    val q = qN0.withColumn("_b", bucket(col("_qv"), col("_qn")))
    val c = cN0.withColumn("_b", bucket(col("_cv"), col("_cn")))
    val pairs = q.join(c, Seq("_b")).filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "_qv", "_qn", "neighbor_id", "_cv", "_cn")
    exactTopKRefine(
      q.select("query_id", "_qv", "_qn"),
      c.select("neighbor_id", "_cv", "_cn"),
      pairs, k, roundDp = -1)
  }

  /** ANN top-k: bucket both sides by [[lshBucket]], equi-join on the
    * bucket, re-rank candidates exactly. Recall < 1 by construction;
    * raise `planes` for precision (smaller buckets) or join on several
    * independent seeds (multi-probe union) for recall.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      planes: Int = 8): DataFrame = {

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
      lshBucket(col(vecCol), dim, planes).as("_b"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      lshBucket(col(vecCol), dim, planes).as("_b"))
    val scored = q.join(c, Seq("_b")).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("_qv"), col("_cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** EXACT cosine top-k through an int8-quantized scan — the
    * compressed-pair-pass scale path. Each vector is quantized once to
    * (scale s, bytes q) with s = max|vᵢ|/127, qᵢ = round(vᵢ/s), so
    * |vᵢ − s·qᵢ| ≤ s/2 and the pair dot product obeys the RIGOROUS
    * bound
    *
    *   |a·b − sa·sb·(qa·qb)| ≤ sa·sb·(Σ|qb|/2 + Σ|qa|/2 + dim/4)
    *
    * (expand a = sa·qa + e, b = sb·qb + f and triangle-inequality the
    * three cross terms; Σ|q| and dim are per-VECTOR constants, so the
    * bound is one multiply-add per pair). The pair scan therefore
    * touches only byte arrays — 4× less data than float32 and an
    * integer multiply-accumulate inner loop — while staying exact:
    * per query, the kth largest LOWER bound (est − β) floors the kth
    * exact cosine, every pair whose UPPER bound (est + β) reaches that
    * floor survives (a superset of the exact top-k by construction),
    * and only survivors pay the decimal-exact re-score. Output is
    * identical to `bruteForceTopK(..., exact = true)` — same
    * similarity values, same ranking, same tie-break — which is
    * exactly what its oracle checks.
    *
    * The staging keeps Spark's WindowGroupLimit pushdown (pure
    * `row_number = k` filter, band applied as a broadcast join —
    * see [[exactTopKRefine]]'s rationale). Persisted frames follow the
    * file-head caching contract (lazy result — caller clears cache).
    *
    * At 100 TB: quantization is a map-side projection persisted with
    * the corpus (in a real deployment the byte arrays would be the
    * stored index); the estimate pass is the only |Q|×|C| work and
    * moves a quarter of the bytes; survivors per query ≈ k + band
    * ties, so the decimal pass and the final window are top-k-sized.
    */
  def quantizedTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      roundDp: Int = -1): DataFrame = {

    import graft.functions.QuantExpressions._
    def prep(df: DataFrame, id: String, p: String) = df.select(
      col(idCol).as(id),
      col(vecCol).as(s"_${p}v"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as(s"_${p}n"),
      i8Scale(col(vecCol)).as(s"_${p}s"),
      i8Quantize(col(vecCol)).as(s"_${p}q"))
      .withColumn(s"_${p}a", i8AbsSum(col(s"_${p}q")))
      .persistTracked
    val q = prep(queries, "query_id", "q")
    val c = prep(corpus, "neighbor_id", "c")

    val den = col("_qn") * col("_cn")
    val estDot = col("_qs") * col("_cs") * i8Dot(col("_qq"), col("_cq")).cast("double")
    // + 1e-9 absorbs double round-off in est/bound themselves (the
    // analytic bound is real-arithmetic; fp noise here is ~1e-13)
    val bndDot = col("_qs") * col("_cs") *
      (col("_ca").cast("double") / 2 + col("_qa").cast("double") / 2 +
        size(col("_qq")).cast("double") / 4)
    // rounding before ranking widens the must-survive band by one
    // rounding quantum (pairs that round INTO a tie at the cutoff)
    val roundSlack = if (roundDp >= 0) math.pow(10.0, -roundDp) else 0.0

    val slim = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        when(den > 0, estDot / den).otherwise(0.0).as("_est"),
        when(den > 0, bndDot / den + 1e-9).otherwise(lit(1e-9)).as("_beta"))
      .persistTracked
    val wLb = Window.partitionBy("query_id")
      .orderBy((col("_est") - col("_beta")).desc, col("neighbor_id"))
    val kth = slim.withColumn("_rn", row_number().over(wLb))
      .filter(col("_rn") === k)
      .select(col("query_id"), (col("_est") - col("_beta")).as("_kth_lb"))
    // left join: a query with < k candidates keeps them all
    val surv = slim.join(broadcast(kth), Seq("query_id"), "left")
      .filter(col("_kth_lb").isNull ||
        col("_est") + col("_beta") >= col("_kth_lb") - roundSlack)
      .select("query_id", "neighbor_id")

    val cosE = when(den > 0, dotExact(col("_qv"), col("_cv")) / den).otherwise(0.0)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(surv.join(q.select("query_id", "_qv", "_qn"), "query_id")),
        "neighbor_id")
      .withColumn("sim", if (roundDp < 0) cosE else round(cosE, roundDp))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  // ------------------------------------------------------------------
  // Product quantization (Jégou, Douze, Schmid, "Product Quantization
  // for Nearest Neighbor Search", IEEE TPAMI 2011) — the piece that
  // makes billion-vector indexes fit in memory: d dims split into m
  // subspaces, each sub-vector replaced by the id of its nearest
  // codeword from a per-subspace k-means codebook, so a 64-float
  // vector stores as m small codes (m=4, ks=16 → 2 BYTES of payload
  // per vector vs 256 — a 128× index compression) and query-time
  // distances come from per-query lookup tables (ADC: asymmetric
  // distance computation) over the codes table alone.
  // ------------------------------------------------------------------

  /** Per-subspace k-means codebooks, trained in-engine: subspace j
    * covers dims [j·d/m, (j+1)·d/m) and gets its own
    * [[kmeansCentroidsExact]] run over the sliced sub-vectors.
    * Returns books(j)(c) = codeword c of subspace j. Training cost is
    * m small k-means fits on slim (d/m)-dim rows; at 100 TB train on
    * a sample (the standard recipe) and encode the full corpus with
    * the cheap assignment below.
    */
  def pqCodebooksExact(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ks: Int, iters: Int): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val ds = dim / m
    // the m subspace fits are INDEPENDENT job chains — submit them
    // from a small driver pool so subspace j+1's tasks back-fill the
    // scheduler while subspace j waits on its collect (guide-§2.6
    // overlap; each fit is its own persist/unpersist lifecycle and
    // every result is a pure function of its own sliced input, so
    // concurrency cannot change a single trained value — wall-clock
    // for m=4 drops ~3× on an idle 32-core driver).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(m, 4))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val fits = (0 until m).map { j =>
        scala.concurrent.Future {
          kmeansCentroidsExact(
            corpus.select(col(idCol), slice(col(vecCol), j * ds + 1, ds).as("_sub")),
            idCol, "_sub", ks, iters)
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fits),
        scala.concurrent.duration.Duration.Inf).toArray
    } finally { pool.shutdown(); () }
  }

  /** SEEDED codebooks — codeword c of subspace j is seed c's j-th
    * sub-vector (the [[ivfTopKSeeded]]/[[lshTopKSeeded]] discipline:
    * a model that is a pure function of named corpus rows, so a SQL
    * oracle can replay the whole ANN query including the codebooks).
    * ks = number of seed rows.
    */
  def pqCodebooksSeeded(seeds: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val ds = dim / m
    val rows = seeds.select(col(idCol), col(vecCol)).orderBy(col(idCol))
      .collect() // seed-set-sized (the collectSeeds precedent)
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(rows.nonEmpty, "empty seed set")
    Array.tabulate(m)(j => rows.map(_.slice(j * ds, (j + 1) * ds)))
  }

  /** PQ-encode the corpus — the STORED INDEX: (id, codes ARRAY<INT>,
    * _cn exact norm, _r residual bound) where codes(j) = argmin-
    * distance codeword of sub-vector j (double argmin, deterministic
    * per row) and _r ≥ ‖v − decode(codes)‖ (double sqrt of the summed
    * sub-residuals; the +1e-9 screening slack downstream absorbs its
    * rounding). One map-side projection; nothing corpus-sized leaves
    * the scan.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      books: Array[Array[Array[Double]]], exact: Boolean = false): DataFrame = {
    val m = books.length
    val ds = books(0)(0).length
    def sub(j: Int) = slice(col("_cv"), j * ds + 1, ds)
    def d2(v: Column, c: Array[Double]): Column = aggregate(
      zip_with(v, lit(c), (x, w) => { val t = x.cast("double") - w; t * t }),
      lit(0.0), (s, v2) => s + v2)
    // exact = decimal-quantized sub-distances so the ASSIGNMENT is
    // engine-replayable (the kmeansCentroidsExact parity rationale) —
    // required when a SQL oracle must reproduce the codes; the double
    // path suffices when a certificate downstream absorbs any
    // assignment ([[pqTopK]]). At corpus scale prefer the double path
    // or the epsilon-banded hybrid (kmeansCentroidsExact's loop).
    def dist(j: Int, c: Array[Double]): Column =
      if (exact) distExactDecimal(sub(j), c) else d2(sub(j), c)
    // assignment + residual as ONE native kernel each
    // (graft.functions.CentroidExpressions, codebooks as reference
    // objects): the m·ks per-row HOF distance folds become k·d
    // primitive flops with identical fold order, argmin ties and
    // scale-12 quantization (CentroidKernelSpec); `dist`/`d2` above
    // remain the executable spec of the per-codeword semantics.
    corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .withColumn("_cn", sqrt(dotExact(col("_cv"), col("_cv"))))
      .withColumn("_codes",
        graft.functions.CentroidExpressions.pqAssign(col("_cv"), books, exact))
      .withColumn("_r",
        sqrt(graft.functions.CentroidExpressions.pqResid2(
          col("_cv"), col("_codes"), books)) + lit(1e-9))
  }

  /** EXACT cosine top-k through the PQ codes scan — [[quantizedTopK]]
    * with PQ in place of int8: the |Q|×|C| estimate pass reads ONLY
    * the codes table (m ints + 2 doubles per vector — never the full
    * vectors), estimates each pair's dot as the ADC lookup-table sum
    * Σⱼ (qⱼ·codeword), and bounds the error RIGOROUSLY by
    * Cauchy–Schwarz: |q·v − q·decode(codes)| = |q·(v − decode)| ≤
    * ‖q‖·r, so on cosine the per-pair slack is β = r/‖v‖ + 1e-9. The
    * kth-largest lower bound per query floors the kth exact cosine;
    * every pair whose upper bound reaches that floor survives (a
    * SUPERSET of the true top-k by construction, for ANY codebook —
    * certification does not depend on training quality, only
    * candidate-count does); survivors alone pay the decimal-exact
    * re-score. Output ≡ `bruteForceTopK(..., exact = true)` — which
    * is exactly what the oracle checks.
    *
    * At 100 TB: [[pqEncode]]'s output is the persisted index (128×
    * smaller than the vectors); compose with [[cellOf]] coarse cells
    * (write the codes table partitioned by cell, probe nProbe cells)
    * for IVF-PQ — the coarse layer trades the certificate for probe
    * locality, which is the q132-style recall-report regime
    * ([[pqAdcRank]]).
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 4, ks: Int = 16, iters: Int = 3,
      roundDp: Int = -1): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val books = pqCodebooksExact(corpus, idCol, vecCol, dim, m, ks, iters)
    val c = pqEncode(corpus, idCol, vecCol, books).persistTracked
    pqCertifiedTopK(queries, idCol, vecCol,
      c.select("neighbor_id", "_cn", "_codes", "_r"),
      c.select("neighbor_id", "_cv", "_cn"), books, k, roundDp)
  }

  /** The certified ADC screen + exact re-score, shared by [[pqTopK]]
    * (inline encode) and [[pqTopKFromIndex]] (stored codes): `codes`
    * = (neighbor_id, _cn, _codes, _r) — the slim index the |Q|×|C|
    * pass scans; `vectors` = (neighbor_id, _cv, _cn) — touched only
    * by the survivor re-score.
    */
  private def pqCertifiedTopK(queries: DataFrame, idCol: String,
      vecCol: String, codes: DataFrame, vectors: DataFrame,
      books: Array[Array[Array[Double]]], k: Int, roundDp: Int): DataFrame = {
    val m = books.length
    val ks = books(0).length
    val ds = books(0)(0).length
    // per-query ADC lookup table: lut(j·ks + c) = qⱼ·codeword(j,c) —
    // m·ks dots per QUERY row, computed once, joined to the codes scan
    // LUT as one native kernel (codebooks as a reference object) — the
    // per-query m·ks HOF dots in one O(m·ks·ds) loop, identical fold
    // order (CentroidKernelSpec)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        sqrt(dotExact(col(vecCol), col(vecCol))).as("_qn"),
        graft.functions.CentroidExpressions.pqLut(col(vecCol), books).as("_lut"))
      .persistTracked
    val den = col("_qn") * col("_cn")
    val estDot = (0 until m).map(j =>
      element_at(col("_lut"),
        lit(j * ks) + element_at(col("_codes"), j + 1) + 1)).reduce(_ + _)
    val slim = q.select("query_id", "_qn", "_lut")
      .join(codes, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        when(den > 0, estDot / den).otherwise(0.0).as("_est"),
        when(den > 0, col("_r") / col("_cn") + 1e-9)
          .otherwise(lit(1e-9)).as("_beta"))
      .persistTracked
    val roundSlack = if (roundDp >= 0) math.pow(10.0, -roundDp) else 0.0
    val wLb = Window.partitionBy("query_id")
      .orderBy((col("_est") - col("_beta")).desc, col("neighbor_id"))
    val kth = slim.withColumn("_rn", row_number().over(wLb))
      .filter(col("_rn") === k)
      .select(col("query_id"), (col("_est") - col("_beta")).as("_kth_lb"))
    val surv = slim.join(broadcast(kth), Seq("query_id"), "left")
      .filter(col("_kth_lb").isNull ||
        col("_est") + col("_beta") >= col("_kth_lb") - roundSlack)
      .select("query_id", "neighbor_id")
    val cosE = when(den > 0,
      dotExact(col("_qv"), col("_cv")) / den).otherwise(0.0)
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    vectors
      .join(broadcast(surv.join(q.select("query_id", "_qv", "_qn"), "query_id")),
        "neighbor_id")
      .withColumn("sim", if (roundDp < 0) cosE else round(cosE, roundDp))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Persist a PQ index: the SLIM codes table (id, exact norm, m
    * codes, residual bound — 128× smaller than the vectors) plus the
    * codebooks, both parquet — encode once, serve forever (the q104
    * stored-IVF discipline applied to PQ). At 100 TB compose with
    * `partitionBy(cell)` over [[cellOf]] for probe locality.
    */
  def writePqIndex(corpus: DataFrame, idCol: String, vecCol: String,
      books: Array[Array[Array[Double]]], path: String): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // a REBUILD resets the generation clock (the writeIvfPqIndex
    // rule): stale tombstones from a previous append at this path
    // would otherwise drop the fresh gen-0 codes at serve time
    val tp = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val tfs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (tfs.exists(tp)) tfs.delete(tp, true)
    pqEncode(corpus, idCol, vecCol, books)
      .select("neighbor_id", "_cn", "_codes", "_r")
      .withColumn("_gen", lit(0L)).withColumn("_slice", lit("base"))
      .write.mode("overwrite").parquet(s"$path/codes")
    books.zipWithIndex.flatMap { case (bk, j) =>
      bk.zipWithIndex.map { case (cw, c) => (j, c, cw.toSeq) }
    }.toSeq.toDF("j", "c", "w").write.mode("overwrite").parquet(s"$path/books")
  }

  /** Codebooks back from a stored index (model-sized collect). */
  def readPqBooks(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(s"$path/books")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty, s"empty PQ codebook table at $path/books")
    Array.tabulate(rows.map(_._1).max + 1)(j =>
      rows.filter(_._1 == j).sortBy(_._2).map(_._3))
  }

  /** INCREMENTAL APPEND to a stored flat-PQ index ([[writePqIndex]])
    * — [[appendToIvfPqIndex]] without the coarse layer: delta vectors
    * are encoded against the FROZEN codebooks (codes, norms, and
    * residual bounds are pure per-row functions of the vector and the
    * frozen books, so appended rows ≡ the rows a full rebuild with
    * those books would produce) and appended to the codes table;
    * re-ingested ids supersede their stale codes through the same
    * (id, gen) tombstone sidecar, applied as an id-level broadcast
    * filter at serve time. The supersede is CORRECTNESS-critical
    * here, not just dedup: a stale codes row encodes the OLD vector,
    * so its ADC estimate and residual bound say nothing about the
    * re-crawled vector — an unsuperseded stale row could certify
    * away a true neighbor. With the filter, the certified screen +
    * exact re-score of [[pqTopKFromIndex]] stays ≡ brute force over
    * the TRUE corpus for any codebook (PqSpec locks it; q234 gates
    * the hybrid composition over live indexes). Ids unique within
    * one delta; empty delta is a no-op; SINGLE WRITER per index path
    * (the generation stamp is read-max-plus-one — a post-commit
    * re-read fails loudly on a foreign slice at our generation
    * instead of corrupting supersede order silently).
    */
  def appendToPqIndex(delta: DataFrame, path: String, idCol: String,
      vecCol: String, batchKey: String = null): Unit = {
    val spark = delta.sparkSession
    if (batchKey != null && batchCommitted(spark, path, batchKey)) return
    if (delta.select(col(idCol)).take(1).isEmpty) return
    val books = readPqBooks(spark, path)
    requireDim(delta, vecCol, books.length * books(0)(0).length,
      "appendToPqIndex")
    ensureManifest(delta.select(col(idCol).as("neighbor_id")), path)
    val gen = 1L + readTombstones(spark, path)
      .map(_.agg(coalesce(max("gen"), lit(0L))).head().getLong(0))
      .getOrElse(0L)
    val slice = java.util.UUID.randomUUID().toString
    pqEncode(delta, idCol, vecCol, books)
      .select("neighbor_id", "_cn", "_codes", "_r")
      .withColumn("_gen", lit(gen)).withColumn("_slice", lit(slice))
      .write.mode("append").parquet(s"$path/codes")
    // one-file commit + post-commit collision check (see
    // Retrieval.appendToInvertedIndex — a multi-file manifest job
    // could publish a subset of its part files on a crash)
    delta.select(col(idCol).as("neighbor_id"), lit(gen).as("gen"),
        lit(slice).as("slice"),
        lit(batchKey).cast("string").as("batch_key"))
      .coalesce(1)
      .write.mode("append").parquet(s"$path/tombstones")
    verifySoleWriter(spark, path, gen, slice)
  }

  /** [[pqTopK]] against a STORED index: the screen scans the persisted
    * codes table (queries never touch full vectors until the survivor
    * re-score, which joins them from `corpus` by id), with appended
    * indexes' superseded rows dropped by the tombstone filter (see
    * [[appendToPqIndex]] — stale codes would break the certificate).
    * Same certificate — output ≡ exact brute force over the corpus.
    */
  def pqTopKFromIndex(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, path: String, roundDp: Int = -1,
      asOfGen: Long = Long.MaxValue): DataFrame = {
    val spark = corpus.sparkSession
    val books = readPqBooks(spark, path)
    val codes = liveCodes(spark, path,
        spark.read.parquet(s"$path/codes"), asOfGen)
      .select("neighbor_id", "_cn", "_codes", "_r")
      .persistTracked
    pqCertifiedTopK(queries, idCol, vecCol, codes,
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
        .join(codes.select("neighbor_id", "_cn"), "neighbor_id"),
      books, k, roundDp)
  }

  /** PURE-ADC PQ ranking — no exact re-score, no certificate: rank
    * corpus vectors per query by the ADC cosine estimate alone (the
    * regime a probe-limited IVF-PQ index actually serves) so its
    * recall against the exact gold can be REPORTED (q132's discipline:
    * approx vs exact as a gated metric, not a hidden assumption).
    * With seeded codebooks ([[pqCodebooksSeeded]]) the entire ranking
    * is a pure function of named corpus rows and a SQL oracle replays
    * it end to end. Est ties break on ascending neighbor id.
    * Output: (query_id, neighbor_id, est ROUNDED 6 dp, rank).
    */
  /** Top-`nProbe` coarse cells per query under a SEEDED cell model:
    * decimal-exact cosine to every seed (seeds ride as literals, the
    * [[nearestSeedRowwise]] shape), ranked per query with ties to the
    * lowest cell id — the probe-selection half of a seeded IVF index,
    * SQL-replayable (the q132 `probes` CTE). Output: (query_id, cell).
    */
  def topSeedCells(queries: DataFrame, seeds: DataFrame, idCol: String,
      vecCol: String, nProbe: Int): DataFrame =
    topSeedCellsFull(queries, seeds, idCol, vecCol, nProbe)
      .select("query_id", "cell")

  /** [[topSeedCells]] keeping the probe's raw query·centroid dot
    * (`qcdot`, the [[dotExact]] value the cosine was built from) —
    * the residual-ADC estimate needs exactly this per-(query, probed
    * cell) term, and ranking and dot come out of ONE dotExact per
    * (query, seed) rather than two. Output: (query_id, cell, qcdot).
    */
  private[graft] def topSeedCellsFull(queries: DataFrame, seeds: DataFrame,
      idCol: String, vecCol: String, nProbe: Int): DataFrame = {
    val model = collectSeeds(seeds.select(col(idCol).as("_cell"),
      col(vecCol).as("_sv"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("_sn")))
    val cells = array(model.map(m => lit(m.cell)).toIndexedSeq: _*)
    val norms = array(model.map(m => lit(m.norm)).toIndexedSeq: _*)
    queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        sqrt(dotExact(col(vecCol), col(vecCol))).as("_qn"))
      .select(col("query_id"), col("_qn"),
        posexplode(array(model.indices.map(i =>
          dotExact(col("_qv"), lit(model(i).vec))).toIndexedSeq: _*))
          .as(Seq("_p", "qcdot")))
      .withColumn("_den", col("_qn") * element_at(norms, col("_p") + 1))
      .withColumn("_sim",
        when(col("_den") > 0, col("qcdot") / col("_den")).otherwise(0.0))
      .withColumn("cell", element_at(cells, col("_p") + 1))
      .withColumn("_rn", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("_sim").desc, col("cell"))))
      .filter(col("_rn") <= nProbe)
      .select("query_id", "cell", "qcdot")
  }

  /** RESIDUAL codebooks for IVF-PQ (Jégou TPAMI 2011 §IV.A): codeword
    * c of subspace j is the j-th sub-vector of book-seed c's residual
    * to its own coarse cell, r = b − centroid(cell(b)) — computed IN
    * the engine (exact-argmax [[assignCells]] + float-minus-float
    * double subtraction) so a SQL oracle replays every codeword from
    * named rows alone. Pass a `bookSeeds` frame DISJOINT from the
    * coarse seeds: a coarse seed's residual to itself is the zero
    * vector and carries no codebook signal.
    */
  def pqResidualCodebooksSeeded(bookSeeds: DataFrame, seeds: DataFrame,
      idCol: String, vecCol: String, dim: Int, m: Int): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val ds = dim / m
    val seedVecs = seeds.select(col(idCol).as("cell"), col(vecCol).as("_sv"))
    val rows = bookSeeds.select(col(idCol), col(vecCol).as("_bv"))
      .join(assignCells(bookSeeds, seeds, idCol, vecCol), idCol)
      .join(broadcast(seedVecs), "cell")
      .select(col(idCol),
        zip_with(col("_bv"), col("_sv"),
          (a, b) => a.cast("double") - b.cast("double")).as("_rv"))
      .orderBy(col(idCol))
      .collect() // book-seed-set-sized (the collectSeeds precedent)
      .map(_.getSeq[Double](1).toArray)
    require(rows.nonEmpty, "empty book-seed set")
    Array.tabulate(m)(j => rows.map(_.slice(j * ds, (j + 1) * ds)))
  }

  /** The COMPOSED IVF-PQ retriever (Jégou TPAMI 2011 §IV, the
    * billion-vector serving shape): seeded coarse cells prune the
    * candidate set to the query's `nProbe` nearest cells, and within
    * probed cells candidates rank by the PQ ADC estimate over the
    * CODES table — the corpus' full vectors are touched only at
    * encode time.
    *
    * `residual = true` is IVFADC PROPER (§IV.A): each vector is
    * PQ-encoded as its residual r = v − centroid(cell(v)) against
    * [[pqResidualCodebooksSeeded]] residual codewords, which points
    * the whole codebook budget at WITHIN-cell detail — the coarse
    * term is carried exactly instead of being re-approximated by the
    * codes. On the inner-product/cosine metric the decomposition is
    * q·v = q·c_cell + q·r ≈ q·c_cell + Σⱼ lut[j][codeⱼ]: the
    * per-(query, probed cell) term q·c_cell is the SAME dotExact the
    * probe selection already computes ([[topSeedCellsFull]] — zero
    * extra vector math), and the LUT is the query against the
    * residual codewords. `residual = false` keeps the raw-encoding
    * diagnostic (codes from the vectors themselves, no coarse term) —
    * the baseline the residual-superiority property is measured
    * against (PqSpec).
    *
    * Probe locality trades the [[pqTopK]] certificate for cost, which
    * is exactly the regime the recall report exists for: q196 gates
    * this ranking's recall against exact gold with every coarse
    * assignment, probe choice, residual, code, and estimate replayed
    * in SQL (seeded cells + seeded residual codebooks + decimal-exact
    * arithmetic throughout). At 100 TB the codes table is written
    * `partitionBy(cell)` and a probe reads nProbe directories —
    * [[writeIvfPqIndex]]/[[pqIvfTopKFromIndex]] are that serving
    * path, plan-locked to prune partitions. Output: (query_id,
    * neighbor_id, est, rank).
    */
  def pqIvfAdcRank(queries: DataFrame, corpus: DataFrame, seeds: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int, m: Int, dim: Int,
      bookSeeds: DataFrame = null, residual: Boolean = true): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    requireDim(corpus, vecCol, dim, "pqIvfAdcRank")
    val bs = Option(bookSeeds).getOrElse(seeds)
    val books =
      if (residual) pqResidualCodebooksSeeded(bs, seeds, idCol, vecCol, dim, m)
      else pqCodebooksSeeded(bs, idCol, vecCol, dim, m)
    val codes = ivfPqCodes(corpus, seeds, idCol, vecCol, books, residual)
    val probes = topSeedCellsFull(queries, seeds, idCol, vecCol, nProbe)
    pqIvfRankFromCodes(queries, probes, codes, idCol, vecCol,
      books, k, residual)
  }

  /** Fail-fast check that the vectors actually have the
    * caller-declared dimensionality — ONE first-row job (limit-1
    * scan, milliseconds): a wrong `dim` would otherwise silently
    * slice short/empty sub-vectors into wrong codes and estimates.
    */
  private def requireDim(df: DataFrame, vecCol: String, dim: Int,
      who: String): Unit = {
    df.select(size(col(vecCol)).as("_d")).take(1) match {
      case Array() => throw new IllegalArgumentException(
        s"$who: input frame is empty — nothing to encode")
      case Array(r) if r.getInt(0) == dim => ()
      case Array(r) => throw new IllegalArgumentException(
        s"$who: dim=$dim but '$vecCol' vectors have length ${r.getInt(0)}")
    }
  }

  /** The IVF-PQ codes table: (neighbor_id, cell, _cn exact norm of the
    * ORIGINAL vector, _codes) with the exact-decimal per-subspace
    * argmin assignment over the residual (or raw) vector — one
    * map-side projection per corpus row after the [[assignCells]]
    * exchange; the full vectors never ride past the encode.
    */
  private def ivfPqCodes(corpus: DataFrame, seeds: DataFrame, idCol: String,
      vecCol: String, books: Array[Array[Array[Double]]],
      residual: Boolean): DataFrame = {
    val m = books.length
    val ds = books(0)(0).length
    val seedVecs = seeds.select(col(idCol).as("cell"), col(vecCol).as("_sv"))
    val withCell = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_v"),
        sqrt(dotExact(col(vecCol), col(vecCol))).as("_cn"))
      .join(assignCells(corpus, seeds, idCol, vecCol)
        .select(col(idCol).as("neighbor_id"), col("cell")), "neighbor_id")
    val enc =
      if (residual) withCell.join(broadcast(seedVecs), "cell")
        .withColumn("_cv", zip_with(col("_v"), col("_sv"),
          (a, b) => a.cast("double") - b.cast("double")))
      else withCell.withColumn("_cv", col("_v"))
    // exact assignment as one native kernel (codebooks as a reference
    // object) — scale-12 quantized distances, first-occurrence argmin,
    // the distExactDecimal argmin image (CentroidKernelSpec)
    enc.select(col("neighbor_id"), col("cell"), col("_cn"),
      graft.functions.CentroidExpressions.pqAssign(col("_cv"), books,
        exact = true).as("_codes"))
  }

  /** The probe + ADC rank over a prepared codes table — shared by the
    * in-query [[pqIvfAdcRank]] and the stored-index
    * [[pqIvfTopKFromIndex]] so the two are the same arithmetic by
    * construction.
    */
  private def pqIvfRankFromCodes(queries: DataFrame, probes: DataFrame,
      codes: DataFrame, idCol: String, vecCol: String,
      books: Array[Array[Array[Double]]], k: Int,
      residual: Boolean): DataFrame = {
    val m = books.length
    val ks = books(0).length
    val ds = books(0)(0).length
    // exact LUT as one native kernel (codebooks as a reference
    // object): per (j,c) entry = quantize-at-12-and-sum-exactly of the
    // sub-vector x codeword products, the dotExactHof image
    // (CentroidKernelSpec locks the bit-identity)
    val q = queries.select(col(idCol).as("query_id"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("_qn"),
      graft.functions.CentroidExpressions.pqLutExact(col(vecCol), books).as("_lut"))
    val den = col("_qn") * col("_cn")
    // every term is an exact 12-dp value living in a double (dotExact /
    // dotExactHof contract): the decimal re-casts recover them exactly,
    // the sum is exact, and ONE double cast + division lands in the
    // oracle's arithmetic
    val lutSum = (0 until m).map(j =>
      element_at(col("_lut"),
        lit(j * ks) + element_at(col("_codes"), j + 1) + 1)
        .cast(DecimalType(20, 12))).reduce(_ + _)
    val estDot =
      (if (residual) col("qcdot").cast(DecimalType(20, 12)) + lutSum
       else lutSum).cast("double")
    val w = Window.partitionBy("query_id")
      .orderBy(col("est").desc, col("neighbor_id"))
    probes.join(codes, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(q, "query_id")
      .withColumn("est",
        round(when(den > 0, estDot / den).otherwise(0.0), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "est", "rank")
  }

  /** Persist an IVF-PQ index, CELL-PARTITIONED — the 100 TB serving
    * layout the [[pqIvfAdcRank]] scaladoc promises: the slim codes
    * table (id, exact norm, m codes — 128× smaller than the vectors)
    * written `partitionBy(cell)` so a probe reads ONLY its nProbe
    * partition directories, plus three model-sized sidecars: the
    * residual codebooks (`books`, the [[writePqIndex]] layout), the
    * coarse cell seeds (`cells` — vectors AND engine-computed norms,
    * so serving-time probe selection is bit-identical to index-time
    * assignment), and `meta` (m, dim, residual flag). Encode once,
    * probe forever — [[pqIvfTopKFromIndex]] is the reader.
    */
  def writeIvfPqIndex(corpus: DataFrame, seeds: DataFrame, idCol: String,
      vecCol: String, m: Int, dim: Int, path: String,
      bookSeeds: DataFrame = null, residual: Boolean = true): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    requireDim(corpus, vecCol, dim, "writeIvfPqIndex")
    val bs = Option(bookSeeds).getOrElse(seeds)
    val books =
      if (residual) pqResidualCodebooksSeeded(bs, seeds, idCol, vecCol, dim, m)
      else pqCodebooksSeeded(bs, idCol, vecCol, dim, m)
    // a REBUILD resets the generation clock: stale tombstones from a
    // previous append at this path would otherwise drop the fresh
    // gen-0 codes at serve time
    val tp = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val tfs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (tfs.exists(tp)) tfs.delete(tp, true)
    ivfPqCodes(corpus, seeds, idCol, vecCol, books, residual)
      .withColumn("_gen", lit(0L)).withColumn("_slice", lit("base"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    books.zipWithIndex.flatMap { case (bk, j) =>
      bk.zipWithIndex.map { case (cw, c) => (j, c, cw.toSeq) }
    }.toSeq.toDF("j", "c", "w").write.mode("overwrite").parquet(s"$path/books")
    seeds.select(col(idCol).as("cell"), col(vecCol).as("sv"),
        sqrt(dotExact(col(vecCol), col(vecCol))).as("sn"))
      .write.mode("overwrite").parquet(s"$path/cells")
    Seq((m, dim, residual)).toDF("m", "dim", "residual")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** INCREMENTAL APPEND to a stored IVF-PQ index ([[writeIvfPqIndex]])
    * — the q85/q148/q179 incremental discipline applied to the ANN
    * tier: a 100 TB corpus is never re-encoded from scratch per crawl.
    * Delta vectors are encoded against the FROZEN books/cells
    * sidecars (codes are a pure per-row function of the vector and
    * the frozen model, so appended codes ≡ the codes a full rebuild
    * would produce) and appended into the cell partition directories;
    * nothing existing is rewritten. RE-INGESTED ids supersede their
    * stale codes through a TOMBSTONE sidecar: each append records
    * (neighbor_id, gen) rows, and serving drops any codes row with a
    * newer tombstone for its id — necessary because a changed vector
    * can land in a DIFFERENT cell, where a within-partition dedup
    * would never see the stale row partition pruning keeps alive.
    * The tombstone table is cumulative-re-ingest-sized (slim id+gen
    * rows, broadcast at serve time); when re-ingests grow large,
    * [[compactIvfPqIndex]] folds them away without re-encoding a
    * single vector (codes are already stored). Precondition (the q179
    * disjoint-delta contract): ids are unique WITHIN one delta, and
    * ONE WRITER owns the index path (read-max-plus-one generations;
    * a post-commit manifest re-read fails loudly on a collision).
    * Serving over the appended index ≡ [[writeIvfPqIndex]] over
    * (base \ re-ingested) ∪ delta (PqSpec locks it; q207 gates it
    * against q201's oracle verbatim over the union corpus).
    */
  def appendToIvfPqIndex(delta: DataFrame, path: String, idCol: String,
      vecCol: String, batchKey: String = null): Unit = {
    val spark = delta.sparkSession
    if (batchKey != null && batchCommitted(spark, path, batchKey)) return
    val meta = spark.read.parquet(s"$path/meta").head()
    val m = meta.getInt(meta.fieldIndex("m"))
    val dim = meta.getInt(meta.fieldIndex("dim"))
    val residual = meta.getBoolean(meta.fieldIndex("residual"))
    // an empty crawl delta is a NO-OP, not an error (and not a new
    // generation): nothing to encode, nothing to supersede
    if (delta.select(col(idCol)).take(1).isEmpty) return
    requireDim(delta, vecCol, dim, "appendToIvfPqIndex")
    val books = readPqBooks(spark, path)
    val seeds = spark.read.parquet(s"$path/cells")
      .select(col("cell").as(idCol), col("sv").as(vecCol))
    ensureManifest(delta.select(col(idCol).as("neighbor_id")), path)
    val gen = 1L + readTombstones(spark, path)
      .map(_.agg(coalesce(max("gen"), lit(0L))).head().getLong(0))
      .getOrElse(0L)
    // slice nonce + manifest-written-last = the commit protocol (see
    // appendToPqIndex scaladoc): a mid-append crash leaves orphan
    // codes that serving never reads
    val slice = java.util.UUID.randomUUID().toString
    ivfPqCodes(delta, seeds, idCol, vecCol, books, residual)
      .withColumn("_gen", lit(gen)).withColumn("_slice", lit(slice))
      .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
    // one-file commit + post-commit collision check (see
    // appendToPqIndex)
    delta.select(col(idCol).as("neighbor_id"), lit(gen).as("gen"),
        lit(slice).as("slice"),
        lit(batchKey).cast("string").as("batch_key"))
      .coalesce(1)
      .write.mode("append").parquet(s"$path/tombstones")
    verifySoleWriter(spark, path, gen, slice)
  }

  /** The tombstone sidecar if any append has happened, else None —
    * a base index's serving plan stays byte-identical to pre-append
    * (no join is added until the first tombstone exists).
    */
  private def readTombstones(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Drop codes rows of UNCOMMITTED slices, then rows superseded by
    * a newer tombstone for their id — the serve-side half of the
    * append commit protocol (see [[appendToPqIndex]]), shared by
    * both stored-index serve paths and the compactors. The supersede
    * must be an id-level broadcast filter (the stale row may live in
    * a DIFFERENT cell than its replacement — never a
    * within-partition dedup); the committed filter is a conjunctive
    * data filter on the scan. Tombstones are slim re-ingest-sized
    * rows; an index with no tombstone sidecar keeps its pre-append
    * plan byte-identical.
    *
    * ON-DISK FORMAT note (ADVICE r19): serving requires `_slice` on
    * the codes rows and `slice`/`batch_key` on the manifest — the
    * slice-commit layout every writer in this version produces. An
    * index APPENDED under the pre-slice-commit layout (r18 and
    * earlier) fails here with an AnalysisException on the missing
    * column; REBUILD it (`writePqIndex`/`writeIvfPqIndex`) rather
    * than migrating in place — a never-appended base index has no
    * manifest and never reaches this filter, so only
    * already-appended old indexes are affected.
    */
  private case class AnnTombState(committed: Seq[String], tmax: DataFrame)

  /** Per-index-state LRU for the manifest readback (the
    * `Retrieval.tombState` caching discipline, ANN edition — VERDICT
    * r19 item 6): the committed-slice collect is per index STATE,
    * not per query, and the filesystem fingerprint key
    * (`ManifestOps.dirSig`) self-invalidates on any
    * append/delete/compact/rebuild. 64 entries of a slice-label list
    * plus a lazy tmax plan — no corpus-sized object; fills run
    * outside the map mutex (`ManifestOps.cached`).
    */
  private val annTombCache = ManifestOps.lruCache[AnnTombState](64)

  /** Drop all cached serve state (spec isolation). */
  private[graft] def clearServeCaches(): Unit = annTombCache.clear()

  private def liveCodes(spark: org.apache.spark.sql.SparkSession,
      path: String, codes: DataFrame,
      asOf: Long = Long.MaxValue): DataFrame = {
    val sig = ManifestOps.dirSig(spark, s"$path/tombstones")
    if (sig == "none") codes
    else {
      val ts = ManifestOps.cached(annTombCache,
        ManifestOps.cacheKey(ManifestOps.tokenOf(spark), asOf, path, sig)) {
          // asOf = time travel (the Retrieval.tombState clock):
          // manifest rows with gen > asOf — later appends AND later
          // deletes — are invisible, re-serving the exact past state
          val raw = spark.read.parquet(s"$path/tombstones")
          val t = if (asOf == Long.MaxValue) raw
            else raw.filter(col("gen") <= asOf)
          AnnTombState(
            t.select(col("slice")).distinct()
              .collect().map(_.getString(0)).toSeq :+ "base",
            t.groupBy("neighbor_id").agg(max("gen").as("_tg")))
        }
      codes.filter(col("_slice").isin(ts.committed: _*))
        .join(broadcast(ts.tmax), Seq("neighbor_id"), "left")
        .filter(col("_tg").isNull || col("_gen") >= col("_tg"))
        .drop("_tg")
    }
  }

  /** INDEX HISTORY for a stored PQ/IVF-PQ index — the lexical
    * `Retrieval.indexHistory` readback of the shared manifest
    * layout: (gen, batch_key, n_docs), one row per committed
    * generation (q246 gates it). */
  def indexHistory(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    // compacted index: lead with the lineage row (see IndexLineage)
    IndexLineage.withHistory(spark, path,
      readTombstones(spark, path).map(
        _.groupBy(col("gen"), col("batch_key"))
          .agg(count(lit(1)).as("n_docs")))
        .getOrElse(spark.range(0).select(lit(0L).as("gen"),
          lit(null).cast("string").as("batch_key"),
          lit(0L).as("n_docs"))))

  /** Create an EMPTY commit manifest before the FIRST append's codes
    * write — without it, a first append dying mid-write would leave
    * orphan codes indistinguishable from a never-appended base index
    * (whose fast path skips the committed filter). See the lexical
    * twin in `Retrieval.ensureManifest`.
    */
  private def ensureManifest(ids: DataFrame, path: String): Unit = {
    val spark = ids.sparkSession
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      ids.select(col("neighbor_id"), lit(0L).as("gen"),
          lit("").as("slice"),
          lit(null).cast("string").as("batch_key"))
        .limit(0).write.mode("append").parquet(p.toString)
  }

  /** True iff `batchKey` already appears in the commit manifest —
    * the idempotent-re-delivery guard for streaming ingest. */
  private def batchCommitted(spark: org.apache.spark.sql.SparkSession,
      path: String, batchKey: String): Boolean =
    readTombstones(spark, path).exists(
      _.filter(col("batch_key") === batchKey).take(1).nonEmpty)

  /** Post-commit single-writer verification — ONE shared definition
    * for both manifest layouts (`ManifestOps.verifySoleWriter`,
    * VERDICT r19 item 1): raise loudly, both nonces named, if a
    * foreign slice shares this commit's generation.
    */
  private[graft] def verifySoleWriter(
      spark: org.apache.spark.sql.SparkSession, path: String,
      gen: Long, slice: String): Unit =
    ManifestOps.verifySoleWriter(spark, path, gen, slice)

  /** RIGHT-TO-BE-FORGOTTEN DELETE from a stored PQ index (flat
    * [[writePqIndex]] or cell-partitioned [[writeIvfPqIndex]] — the
    * manifest layout is shared): a tombstone-only append at a fresh
    * generation; the deleted ids' codes rows all carry older
    * generations, so [[liveCodes]] drops them in every cell, and the
    * compactors physically remove them. A later re-ingest
    * resurrects the id. O(|deletes|) write cost; atomic (the
    * manifest write IS the delete). The lexical twin is
    * `Retrieval.deleteFromInvertedIndex` (q239); q241 gates this one
    * against the filtered-corpus recall replay.
    */
  def deleteFromPqIndex(ids: DataFrame, path: String, idCol: String,
      batchKey: String = null): Unit = {
    val spark = ids.sparkSession
    if (batchKey != null && batchCommitted(spark, path, batchKey)) return
    val keyed = ids.select(col(idCol).as("neighbor_id"))
    if (keyed.take(1).isEmpty) return
    ensureManifest(keyed, path)
    val gen = 1L + readTombstones(spark, path)
      .map(_.agg(coalesce(max("gen"), lit(0L))).head().getLong(0))
      .getOrElse(0L)
    val slice = java.util.UUID.randomUUID().toString
    keyed.select(col("neighbor_id"), lit(gen).as("gen"),
        lit(slice).as("slice"),
        lit(batchKey).cast("string").as("batch_key"))
      .coalesce(1)
      .write.mode("append").parquet(s"$path/tombstones")
    verifySoleWriter(spark, path, gen, slice)
  }

  /** COMPACTION for a stored IVF-PQ index ([[writeIvfPqIndex]] after
    * [[appendToIvfPqIndex]] cycles): rewrite the LIVE codes
    * (tombstone supersede applied, generations reset to 0) into fresh
    * cell partitions at a NEW path — with the books/cells/meta
    * sidecars copied verbatim — and no tombstone sidecar
    * (write-new-flip-pointer, the object-store-safe shape the
    * lexical tier's q226/q233 use). MUCH cheaper than the
    * rebuild-to-compact the append scaladoc used to prescribe: codes
    * are already encoded, so compaction is one partitioned rewrite
    * of the slim codes table, no re-encoding pass over the vectors.
    * Serving from the compacted index is bit-identical to the source
    * (q236 gates it against q201's oracle verbatim).
    */
  def compactIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, dstPath: String): Unit = {
    val tp = new org.apache.hadoop.fs.Path(s"$dstPath/tombstones")
    val tfs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (tfs.exists(tp)) tfs.delete(tp, true)
    liveCodes(spark, srcPath, spark.read.parquet(s"$srcPath/codes"))
      .withColumn("_gen", lit(0L)).withColumn("_slice", lit("base"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dstPath/codes")
    Seq("books", "cells", "meta").foreach { s =>
      spark.read.parquet(s"$srcPath/$s")
        .write.mode("overwrite").parquet(s"$dstPath/$s")
    }
    // retention/lineage contract (VERDICT r19 item 3) — see
    // IndexLineage: the OLD path stays servable for pinned asOfGen
    // reads until the operator drops it
    IndexLineage.write(spark, srcPath, dstPath,
      spark.read.parquet(s"$dstPath/codes").count())
  }

  /** [[compactIvfPqIndex]] for the FLAT certified-PQ index
    * ([[writePqIndex]] after [[appendToPqIndex]] cycles): live codes
    * rewritten gen-0, books copied, no tombstones. PqSpec locks
    * serve-invisibility.
    */
  def compactPqIndex(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, dstPath: String): Unit = {
    val tp = new org.apache.hadoop.fs.Path(s"$dstPath/tombstones")
    val tfs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (tfs.exists(tp)) tfs.delete(tp, true)
    liveCodes(spark, srcPath, spark.read.parquet(s"$srcPath/codes"))
      .withColumn("_gen", lit(0L)).withColumn("_slice", lit("base"))
      .write.mode("overwrite").parquet(s"$dstPath/codes")
    spark.read.parquet(s"$srcPath/books")
      .write.mode("overwrite").parquet(s"$dstPath/books")
    IndexLineage.write(spark, srcPath, dstPath,
      spark.read.parquet(s"$dstPath/codes").count())
  }

  /** Serve IVF-PQ from a STORED index ([[writeIvfPqIndex]]): probe
    * selection against the `cells` sidecar, then the ADC rank reads
    * ONLY the probed cells' partition directories — the union of the
    * query batch's probed cells (≤ |cells|, model-sized by the seed
    * contract) lands as an `IN` filter on the PARTITION column, so
    * the parquet scan's PartitionFilters prune every unprobed
    * directory (plan-locked in PlanShapeSpec). Output is identical to
    * the in-query [[pqIvfAdcRank]] with the same seeds/books — the
    * two share [[pqIvfRankFromCodes]], and the index stores exact
    * norms/codes/codebooks losslessly.
    */
  def pqIvfTopKFromIndex(queries: DataFrame, path: String, idCol: String,
      vecCol: String, k: Int, nProbe: Int,
      asOfGen: Long = Long.MaxValue): DataFrame = {
    val spark = queries.sparkSession
    val meta = spark.read.parquet(s"$path/meta").head()
    val residual = meta.getBoolean(meta.fieldIndex("residual"))
    val books = readPqBooks(spark, path)
    val seeds = spark.read.parquet(s"$path/cells")
      .select(col("cell").as(idCol), col("sv").as(vecCol))
    val probes = topSeedCellsFull(queries, seeds, idCol, vecCol, nProbe)
      .persistTracked
    // the probed-cell union is bounded by the CELL count (model-sized
    // by the coarse-seed contract), not the query count — a driver-side
    // constant is the price of literal partition pruning, same as q104
    val codesRaw = spark.read.parquet(s"$path/codes")
    val cellType = codesRaw.schema("cell").dataType
    val probeCellType = probes.schema("cell").dataType
    val probed = probes.select("cell").distinct().collect().map(_.get(0))
      .map { v => // match the inferred partition-column type so the IN
                  // lands on the attribute itself, not under a cast
        (v, cellType) match {
          case (n: Number, IntegerType) => n.intValue()
          case (n: Number, LongType) => n.longValue()
          case (_, t) if t == probeCellType => v
          case (_, t) => throw new IllegalArgumentException(
            s"pqIvfTopKFromIndex: codes partition column 'cell' at " +
              s"$path/codes has type $t but the cells sidecar probes " +
              s"are $probeCellType — the index id type and the " +
              "serving idCol do not line up (a silent pass-through " +
              "here would serve empty results)")
        }
      }
    // cast back to the SIDECAR's cell type (not a hard-coded Long):
    // the join key in pqIvfRankFromCodes must match the probes side,
    // whatever id type the index was written with
    val codes = codesRaw.filter(col("cell").isin(probed.toIndexedSeq: _*))
      .withColumn("cell", col("cell").cast(probeCellType))
    // appended index: drop codes rows superseded by a newer tombstone
    // for the same id (see liveCodes — id-level broadcast filter;
    // asOfGen = time travel)
    val live = liveCodes(spark, path, codes, asOfGen)
    pqIvfRankFromCodes(queries, probes, live, idCol, vecCol,
      books, k, residual)
  }

  /** DIAGNOSTIC ONLY — O(|Q|·|C|) by construction: flat ADC with no
    * coarse layer and no certificate, joining every query to every
    * code row (a theta join that plans as BroadcastNestedLoop). It
    * exists so q190's recall report can measure what PURE codes-table
    * ranking costs in isolation; the query side is model-sized there.
    * Never the serving path at scale — that is [[pqIvfAdcRank]] /
    * [[pqIvfTopKFromIndex]] (cell-pruned) or [[pqTopK]] (certified).
    */
  def pqAdcRank(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, books: Array[Array[Array[Double]]]): DataFrame = {
    val m = books.length
    val ks = books(0).length
    val ds = books(0)(0).length
    // exact assignment + exact LUT dots: every number on the ranking
    // path is an exact-decimal value (or its one double cast), so a
    // SQL oracle replays codes, estimates, and the rounded-then-ranked
    // order bit-for-bit
    val c = pqEncode(corpus, idCol, vecCol, books, exact = true)
      .select("neighbor_id", "_cn", "_codes")
    // exact LUT as one native kernel (codebooks as a reference
    // object): per (j,c) entry = quantize-at-12-and-sum-exactly of the
    // sub-vector x codeword products, the dotExactHof image
    // (CentroidKernelSpec locks the bit-identity)
    val q = queries.select(col(idCol).as("query_id"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("_qn"),
      graft.functions.CentroidExpressions.pqLutExact(col(vecCol), books).as("_lut"))
    val den = col("_qn") * col("_cn")
    // each LUT entry is an exact 12-dp value in a double; the decimal
    // re-cast recovers it exactly, the m-term sum is exact, and ONE
    // double cast + division lands in the oracle's arithmetic
    val estDot = (0 until m).map(j =>
      element_at(col("_lut"),
        lit(j * ks) + element_at(col("_codes"), j + 1) + 1)
        .cast(DecimalType(20, 12))).reduce(_ + _).cast("double")
    val w = Window.partitionBy("query_id")
      .orderBy(col("est").desc, col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("est",
        round(when(den > 0, estDot / den).otherwise(0.0), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "est", "rank")
  }
}
