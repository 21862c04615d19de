package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Planted-skew stress bench: proves the de-skewed operator shapes
  * actually win where they claim to — under a mega duplicate cluster
  * and a shared boilerplate window — by timing the CURRENT partial-agg
  * forms against the per-key-window forms they replaced (round 5-7
  * work; see PLANS.md). The sf corpora are skew-free, so without this
  * fixture the 100 TB claim ("a window over a hot key ships the whole
  * cluster to one task") was plan-shape-asserted but never measured.
  *
  * Fixtures (deterministic, built from spark.range):
  *  - STAR: one duplicate cluster of `clusterSize` docs (every doc
  *    paired to doc 0 — the shape near-dup graphs converge to, with
  *    root degree = cluster size) plus 1 000 chains of length 100
  *    (forces several star rounds).
  *  - BOILERPLATE: `nDocs` documents sharing one exact `windowTokens`
  *    run (a license header) plus unique body tokens — the classic
  *    quadratic hazard substringWindowPairs' df cap exists for.
  *
  * For each, two measured variants:
  *  - `current`: the shipped operator ([[graft.operators.Dedup
  *    .componentsStar]] rounds / partial-agg df).
  *  - `legacyWindow`: the identical logical computation with per-key
  *    minima/df via `min()/count().over(Window.partitionBy(key))` —
  *    the round-5/6 shape this library removed. Kept ONLY here, as a
  *    measurement baseline.
  *
  * Prints one JSON line with seconds per variant. Results land in
  * PERF.md.
  */
object SkewBench {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  // ---- legacy per-key-window star rounds (measurement baseline) ----

  private def largeStarRoundWindow(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    sym.withColumn("_nmin", min(col("v")).over(Window.partitionBy("u")))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), least(col("u"), col("_nmin")).as("v"))
      .distinct()
  }

  private def smallStarRoundWindow(edges: DataFrame): DataFrame = {
    val dir = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val withMin = dir.withColumn("_m", min(col("v")).over(Window.partitionBy("u")))
    withMin.filter(col("v") =!= col("_m"))
      .select(col("v").as("u"), col("_m").as("v"))
      .union(withMin.select(col("u"), col("_m").as("v")).distinct())
      .distinct()
  }

  /** componentsStar's loop with the window-form rounds swapped in —
    * identical fixed point, legacy physical shape.
    */
  private def componentsStarWindow(
      vertices: DataFrame, pairs: DataFrame, maxIter: Int = 60): DataFrame = {
    def cp(df: DataFrame): DataFrame = df.localCheckpoint(true)
    def fingerprint(edges: DataFrame): (Long, Long) = {
      val r = edges.agg(count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }
    var edges = cp(pairs
      .select(col("a").as("u"), col("b").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct())
    var fp = fingerprint(edges)
    var iter = 0
    var converged = edges.isEmpty
    while (!converged && iter < maxIter) {
      edges = cp(smallStarRoundWindow(largeStarRoundWindow(edges)))
      val fpNext = fingerprint(edges)
      converged = fpNext == fp
      fp = fpNext
      iter += 1
    }
    vertices.select(col("id").as("v"))
      .join(edges.select(col("u").as("v"), col("v").as("_root")), Seq("v"), "left")
      .select(col("v"), coalesce(col("_root"), col("v")).as("comp"))
  }

  // ---- legacy per-key-window substring df (measurement baseline) ----

  private def substringPairsWindowDf(
      df: DataFrame, windowTokens: Int, maxDf: Int): DataFrame = {
    val wins = df
      .select(col("doc_id").as("_id"),
        explode(graft.operators.NearDup.shingles(col("text"), windowTokens)).as("_win"))
      .select(col("_id"), xxhash64(col("_win")).as("_wh"))
    val kept = wins
      .withColumn("_df", count(lit(1)).over(Window.partitionBy("_wh")))
      .filter(col("_df") >= 2 && col("_df") <= maxDf)
      .select("_id", "_wh")
    kept.select(col("_id").as("id_a"), col("_wh"))
      .join(kept.select(col("_id").as("id_b"), col("_wh")), Seq("_wh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_windows"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val clusterSize = sys.env.getOrElse("SPARK_GRAFT_SKEW_CLUSTER", "4000000").toInt
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_SKEW_DOCS", "100000").toInt
    // At 100 TB a hot key's partition is GBs and AQE's default skew
    // thresholds (256 MB / 5× median) fire; at bench scale the hot
    // partition is ~100 MB, so emulate the production regime by
    // scaling the thresholds down proportionally (SKEW_EMULATE=1,
    // the default). SKEW_EMULATE=0 keeps stock AQE — at that setting
    // NOTHING can split the hot key and both forms serialize on it;
    // the pair of runs brackets the claim.
    val emulate = sys.env.getOrElse("SPARK_GRAFT_SKEW_EMULATE", "1") == "1"
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val b2 =
      if (emulate) b
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      else b
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // STAR fixture: duplicate mega-cluster (i, 0) + 1000 chains of 100
    val cluster = spark.range(1, clusterSize)
      .select(col("id").as("a"), lit(0L).as("b"))
    val chainBase = 10000000L
    val chains = spark.range(0, 100000)
      .filter(col("id") % 100 =!= 99) // break into chains of length 100
      .select((col("id") + chainBase).as("a"), (col("id") + chainBase + 1).as("b"))
    val pairs = cluster.union(chains)
    val vertices = spark.range(0, clusterSize).select(col("id"))
      .union(spark.range(chainBase, chainBase + 100000).select(col("id")))

    // Interleaved min-of-2 per variant: the first Spark jobs in a JVM
    // pay several seconds of warmup, which the original single-pass
    // ordering charged entirely to whichever variant ran first.
    def minOf2(body: => Long): (Long, Double) = {
      val (a1, t1) = time(body)
      val (a2, t2) = time(body)
      require(a1 == a2, s"nondeterministic variant: $a1 vs $a2")
      (a1, math.min(t1, t2))
    }
    val (nCur, tCur) = minOf2 {
      graft.operators.Dedup.componentsStar(vertices, "id", pairs, "a", "b")
        .agg(countDistinct(col("comp"))).head().getLong(0)
    }
    val (nWin, tWin) = minOf2 {
      componentsStarWindow(vertices, pairs)
        .agg(countDistinct(col("comp"))).head().getLong(0)
    }
    require(nCur == nWin, s"variant disagreement: $nCur vs $nWin components")

    // BOILERPLATE fixture: every doc carries the same 12-token header
    // (one shared 10-token window after shingling w=10 spans it) plus
    // a few unique body tokens; ~1% of docs also share pairwise
    // 10-token runs (df=2 — the pairs the operator must still emit)
    val boiler = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    val docs = spark.range(0, nDocs).select(
      col("id").as("doc_id"),
      concat(
        lit(boiler + " "),
        format_string("u%da v%db w%dc x%dd", col("id"), col("id"), col("id"), col("id")),
        when(col("id") % 100 < 2, { // doc pairs (2k, 2k+1) share a run
          val h = floor(col("id") / 2).cast("long")
          format_string(" p%d q%d r%d s%d t%d n%d o%d z%d y%d k%d",
            h, h, h, h, h, h, h, h, h, h)
        }).otherwise(lit(""))).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()

    val (pCur, tDfCur) = minOf2 {
      graft.operators.Dedup.substringWindowPairs(docs, "doc_id", "text",
        windowTokens = 10, maxDf = 16)
        .agg(count(lit(1))).head().getLong(0)
    }
    val (pWin, tDfWin) = minOf2 {
      substringPairsWindowDf(docs, windowTokens = 10, maxDf = 16)
        .agg(count(lit(1))).head().getLong(0)
    }
    require(pCur == pWin, s"variant disagreement: $pCur vs $pWin pairs")

    println(s"""{"metric":"skew","cluster_size":$clusterSize,"n_docs":$nDocs,""" +
      s""""emulate":$emulate,""" +
      s""""components":{"current":$tCur,"legacy_window":$tWin,"n_components":$nCur},""" +
      s""""substring_df":{"current":$tDfCur,"legacy_window":$tDfWin,"n_pairs":$pCur}}""")
    spark.stop()
  }
}
