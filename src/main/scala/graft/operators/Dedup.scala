package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic first-wins deduplication (reference O18: `date UNIQUE`
  * + swallowed insert errors, populate_from_json.py:465, 531-535 —
  * duplicate dates in the input are silently dropped, first wins).
  *
  * Spark's `dropDuplicates` keeps an ARBITRARY row per key (whichever
  * partition wins the race), which breaks oracle parity and run-to-run
  * determinism on a cluster. `row_number() = 1` over an explicit
  * tiebreak order is deterministic at any parallelism — one shuffle on
  * the key, same as dropDuplicates would cost.
  */
object Dedup {

  /** Keep exactly one row per `keys`, the first by `order`. */
  def firstWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Connected components over an undirected edge list — the
    * cluster step of corpus-level near-dup dedup ("keep one document
    * per near-dup cluster"): returns (`v`, `comp`) where `comp` is the
    * MINIMUM vertex id reachable from `v`, so the canonical document
    * of every cluster is its lowest id — deterministic at any
    * parallelism, integer-only (no FP parity concerns).
    *
    * Iterative min-label propagation: each round is one equi-join
    * (labels across edges) + one partial-aggregated groupBy min, and
    * rounds needed = graph diameter. Near-dup graphs are shallow
    * (duplicate clusters are near-cliques), so a handful of rounds
    * converges; the per-round convergence check ships a single COUNT
    * scalar to the driver, never data. For adversarially deep graphs
    * switch to large-star/small-star (same join primitive, O(log n)
    * rounds) — not needed for dedup workloads.
    *
    * @param reliableCheckpoint use reliable `checkpoint()` (requires
    *        `spark.checkpoint.dir`) instead of `localCheckpoint` —
    *        survives executor loss on long cluster runs
    */
  def components(
      vertices: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 10,
      reliableCheckpoint: Boolean = false): DataFrame = {
    def cp(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(true) else df.localCheckpoint(true)
    val edges = pairs.select(col(aCol).as("_src"), col(bCol).as("_dst"))
      .union(pairs.select(col(bCol).as("_src"), col(aCol).as("_dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint (not persist): each round references the label
    // frame twice, so a lineage-preserving cache would DOUBLE the plan
    // tree per round — exponential plan growth that OOMs the driver on
    // high-diameter graphs. Checkpointing truncates the plan to a scan
    // of the materialized blocks; on a cluster with lost-executor
    // tolerance requirements use reliable checkpoint() instead.
    var labels = cp(vertices.select(col(idCol).as("v"), col(idCol).as("comp")))
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("v").as("_src"), col("comp")), "_src")
        .groupBy(col("_dst").as("v"))
        .agg(min(col("comp")).as("_nmin"))
      val next = cp(labels
        .join(neighborMin, Seq("v"), "left")
        .select(col("v"), least(col("comp"), coalesce(col("_nmin"), col("comp"))).as("comp"),
          col("comp").as("_old")))
      changed = next.filter(col("comp") =!= col("_old")).count()
      labels = next.drop("_old")
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Exact content dedup by hash (LLM-pipeline): one row per distinct
    * `sha2(contentCol)`, first by `order`. The hash groupBy shuffles on
    * the 64-hex digest — uniformly distributed, so no skew at 100 TB;
    * identical documents land on one reducer regardless of count
    * (pathological mono-duplicate corpora would need a pre-aggregation
    * by (hash, partition) first, which `row_number` here avoids by
    * being a single pass).
    */
  def exactByHash(
      df: DataFrame,
      contentCol: String,
      order: Seq[Column]): DataFrame =
    firstWins(
      df.withColumn("_h", sha2(col(contentCol), 256)),
      Seq("_h"), order).drop("_h")
}
