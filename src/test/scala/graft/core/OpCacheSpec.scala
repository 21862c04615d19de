package graft.core

import graft.SparkSpec
import graft.operators.Similarity

/** Cache-lifecycle contract: operator-internal persists are registered
  * with [[OpCache]] and releasable by a long-lived session without
  * nuking the caller's own caches — and release actually frees the
  * blocks (the round-7 leak: quantizedTopK's three persisted frames
  * lived until someone happened to clearCache the whole session).
  */
class OpCacheSpec extends SparkSpec {
  import spark.implicits._

  test("operator persists register with OpCache; release frees the blocks, caller caches survive") {
    spark.catalog.clearCache()
    OpCache.release(blocking = true)

    // a CALLER-owned cache that must survive an OpCache.release
    val mine = (1 to 100).toDF("x").cache()
    mine.count()

    val emb = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 17 + d * 5) % 11).toFloat / 11f - 0.4f)))
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizedTopK(emb.filter($"vec_id" < 5), emb,
      "vec_id", "embedding", k = 3)
    q.collect()

    assert(OpCache.registered >= 3,
      s"quantizedTopK should register its q/c/slim persists, got ${OpCache.registered}")
    val cachedDuring = spark.sparkContext.getPersistentRDDs.size
    assert(cachedDuring > 1, s"expected operator blocks + caller cache, got $cachedDuring")

    OpCache.release(blocking = true)
    assert(OpCache.registered === 0)
    // only the caller's cache remains
    assert(spark.sparkContext.getPersistentRDDs.size === 1,
      "release should free exactly the operator-internal blocks")
    assert(mine.count() === 100)

    // the released result is still correct (recompute path intact)
    assert(q.collect().nonEmpty)
    mine.unpersist(true)
    spark.catalog.clearCache()
    OpCache.release(blocking = true)
  }
}
