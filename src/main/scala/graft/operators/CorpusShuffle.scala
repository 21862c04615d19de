package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic seeded corpus shuffle + shard assignment — the
  * "global random order" a training export needs WITHOUT a global
  * sort. Training dynamics require documents in (pseudo)random order,
  * reproducibly: the order must be a pure function of (seed, doc id)
  * so that re-runs, resumed runs, and independently-written shards
  * all agree. No counterpart in the reference ETL; extension-tier
  * scope.
  *
  * Construction: `key = md5-48(seed ':' id)` — 48 bits of the md5 hex
  * prefix as a BIGINT, the engine's standard deterministic-uniform
  * device (same arithmetic as the Efraimidis-Spirakis keys in q110
  * and the fold assignment in q137, so DuckDB replays it with the
  * strpos fold). Then `shard = key mod nShards` and the within-shard
  * order is `(key, id)` — the id tiebreak makes the total order a
  * genuine permutation even on the ~(n²/2⁴⁸) key collisions.
  *
  * 100 TB shape — the point of the design:
  *  - NO global sort and NO window over the corpus: the permutation
  *    is carried by the (shard, key) pair, not by a materialized
  *    rank. A writer emits shard files with
  *    `repartition(nShards, shard)` + `sortWithinPartitions(key,
  *    id)` — one all-to-all of slim rows, per-partition local sort,
  *    exactly the shuffle a training export already pays to write
  *    shards at all.
  *  - md5-48 keys are uniform, so shard sizes concentrate at
  *    n/nShards (±√n) — no hot shard, AQE has nothing to fix.
  *  - reproducible resume: any shard can be re-materialized alone
  *    (filter by shard, sort by key) without touching the rest of
  *    the corpus.
  *
  * [[shardManifest]] is the gate-facing summary: per-shard counts
  * plus an order-independent XOR membership fingerprint (the q135
  * device) — any wrong shard assignment, dropped doc, or key error
  * changes a fingerprint even though no per-row permutation table is
  * ever materialized.
  */
object CorpusShuffle {

  /** Adds `shuffle_key` (the md5-48 BIGINT) and `shard`. */
  def assignShards(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val key = conv(substring(md5(
        concat(lit(seed), lit(":"), col(idCol).cast("string"))), 1, 12), 16, 10)
      .cast("long")
    df.withColumn("shuffle_key", key)
      .withColumn("shard", pmod(key, lit(nShards.toLong)))
  }

  /** Per-shard manifest: (shard, n_docs, min_key, max_key,
    * member_fp) where member_fp = bit_xor of md5-48(seed ':' id) —
    * order-independent, parallelism-independent, and sensitive to
    * every individual membership.
    */
  def shardManifest(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame =
    assignShards(df, idCol, seed, nShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        min("shuffle_key").as("min_key"),
        max("shuffle_key").as("max_key"),
        bit_xor(col("shuffle_key")).as("member_fp"))
      .orderBy("shard")
}
