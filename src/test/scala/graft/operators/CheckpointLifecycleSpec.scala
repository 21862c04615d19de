package graft.operators

import graft.SparkSpec
import graft.core.OpCache

/** Checkpoint-block lifecycle for the connected-components family —
  * the round-11 leak: both operators eagerly `localCheckpoint` every
  * round and stranded every round's blocks for the session (checkpoint
  * blocks are lineage-truncated, so Spark's storage layer can never
  * evict them itself — a long-lived incremental-dedup session
  * accumulates |edges|-sized pinned blocks per round per call until
  * storage memory is gone). Contract now: interior rounds are freed
  * the moment the next round materializes; ONLY the result-backing
  * checkpoint survives the call, registered with [[OpCache]] so the
  * caller's pipeline-boundary release frees it (after which the
  * returned frame is dead — checkpoints cannot recompute).
  */
class CheckpointLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def cleanSlate(): Set[Int] = {
    spark.catalog.clearCache()
    OpCache.release(blocking = true)
    spark.sparkContext.getPersistentRDDs.keySet.toSet
  }

  private def strays(base: Set[Int]): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet -- base

  test("componentsStar frees every interior round; only the fixed-point checkpoint survives until release") {
    val base = cleanSlate()
    val vertices = (0L until 200L).toDF("id")
    // a path graph forces multiple star rounds — several interior cps
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val out = Dedup.componentsStar(vertices, "id", pairs, "a", "b")
    assert(strays(base).size === 1,
      s"only the result-backing checkpoint may remain after the call, got ${strays(base)}")
    assert(OpCache.registeredRdds === 1,
      "the fixed-point checkpoint must be registered for session release")
    assert(out.collect().forall(_.getLong(1) == 0L))
    OpCache.release(blocking = true)
    assert(OpCache.registeredRdds === 0)
    assert(strays(base).isEmpty,
      "release must free the fixed-point checkpoint blocks")
  }

  test("components frees per-round label checkpoints; result blocks release via OpCache") {
    val base = cleanSlate()
    val vertices = (0L until 12L).toDF("id")
    val pairs = (0L until 11L).map(i => (i, i + 1)).toDF("a", "b")
    val out = Dedup.components(vertices, "id", pairs, "a", "b", maxIter = 15)
    assert(strays(base).size === 1,
      s"only the final label checkpoint may remain, got ${strays(base)}")
    assert(out.collect().forall(_.getLong(1) == 0L))
    OpCache.release(blocking = true)
    assert(strays(base).isEmpty)
  }

  test("non-convergence throw strands zero checkpoint blocks") {
    val base = cleanSlate()
    val vertices = (0L until 30L).toDF("id")
    val pairs = (0L until 29L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      Dedup.components(vertices, "id", pairs, "a", "b", maxIter = 2)
    }
    assert(strays(base).isEmpty, "the throw path must free the last round's blocks")
    assert(OpCache.registeredRdds === 0)
  }

  test("reliableCheckpoint=true: labels identical to the local path; interior files freed per round; release deletes the rest") {
    val base = cleanSlate()
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_test").toString
    spark.sparkContext.setCheckpointDir(dir)
    def rddDirs(): Seq[String] = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("rdd-")).toList
      finally s.close()
    }
    val vertices = (0L until 1000L).toDF("id")
    val pairs = (0L until 999L).map(i => (i, i + 1)).toDF("a", "b")
    val viaLocal = Dedup.componentsStar(vertices, "id", pairs, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    OpCache.release(blocking = true)

    val reliable = Dedup.componentsStar(vertices, "id", pairs, "a", "b",
      reliableCheckpoint = true)
    assert(rddDirs().size === 1,
      s"interior rounds' checkpoint files must be deleted eagerly, got ${rddDirs()}")
    assert(reliable.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === viaLocal)
    OpCache.release(blocking = true)
    assert(rddDirs().isEmpty,
      "release must delete the fixed-point checkpoint files")
    assert(strays(base).isEmpty)
  }
}
