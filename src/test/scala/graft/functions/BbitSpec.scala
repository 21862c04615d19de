package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.operators.NearDup

/** BbitKernels (1-bit minhash pack + Jaccard estimate) and the
  * b-bit-prefiltered near-dup pipeline.
  */
class BbitSpec extends SparkSpec {
  import spark.implicits._

  test("pack sets exactly the LSB bits, little-endian within words") {
    // sig values with LSBs 1,0,1,1 -> word bits 0,2,3 set = 13
    val sig = new GenericArrayData(Array(7L, 4L, 9L, 123L))
    val packed = BbitKernels.pack(sig)
    assert(packed.numElements() === 1)
    assert(packed.getLong(0) === (1L | (1L << 2) | (1L << 3)))
  }

  test("pack spans words at k > 64") {
    val vals = Array.tabulate(128L.toInt)(j => if (j == 0 || j == 127) 1L else 2L)
    val packed = BbitKernels.pack(new GenericArrayData(vals))
    assert(packed.numElements() === 2)
    assert(packed.getLong(0) === 1L)
    assert(packed.getLong(1) === (1L << 63))
  }

  test("estimate: identical signatures give 1, independent-ish give ~0") {
    val a = new GenericArrayData(Array(0x0f0f0f0f0f0f0f0fL, -1L))
    assert(BbitKernels.estimate(a, a, 128) === 1.0)
    // exactly half the bits differ -> m = k/2 -> raw estimate 0
    val b = new GenericArrayData(Array(0xf0f0f0f0f0f0f0f0L, -1L))
    assert(BbitKernels.estimate(a, b, 128) ===
      math.max(2.0 * (128 - 64) / 128 - 1.0, 0.0))
    // more than half differ -> clamps at 0, never negative
    val c = new GenericArrayData(Array(0xf0f0f0f0f0f0f0f0L, 0L))
    assert(BbitKernels.estimate(a, c, 128) === 0.0)
  }

  test("estimate fails loudly on mismatched / truncated signatures") {
    val full = new GenericArrayData(Array(-1L, -1L))
    val short = new GenericArrayData(Array(-1L))
    val e = intercept[IllegalArgumentException] {
      BbitKernels.estimate(full, short, 128)
    }
    assert(e.getMessage.contains("2 words"), e.getMessage)
    // both wrong for the claimed k also throws (no silent bias to 1)
    intercept[IllegalArgumentException] {
      BbitKernels.estimate(short, short, 128)
    }
  }

  test("vacuous margin skips the screen: exact-equality unconditional") {
    // threshold 0.05 < derived margin 4/sqrt(128) ~ 0.354 -> screen
    // skipped, all banded candidates verified exactly
    val docs = (0 until 20).map { i =>
      (i.toLong, (0 until 30).map(t => s"e${i}_w$t").mkString(" "))
    }
    val d0 = docs.toDF("doc_id", "text")
    val mutated = d0.select((col("doc_id") + 1000).as("doc_id"),
      concat_ws(" ", slice(split(col("text"), " "), 2, 1000)).as("text"))
    val corpus = d0.unionByName(mutated)
    val plain = NearDup.nearDupPairs(corpus, "doc_id", "text", 0.05)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    val bbit = NearDup.bbitPrefilteredPairs(corpus, "doc_id", "text", 0.05)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    assert(bbit === plain)
    assert(bbit.nonEmpty)
  }

  test("estimator tracks true Jaccard on real minhash signatures") {
    // two docs sharing ~90% of shingles vs two unrelated docs
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (4 to 60).map(i => s"tok$i").mkString(" ")
    val far = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "text")
    val sh = df.select(col("id"), NearDup.shingles(col("text"), 3).as("sh"))
    val sig = sh.select(col("id"),
      graft.functions.HashExpressions.bbitPack(
        NearDup.minhashSignature(col("sh"), 128)).as("bb"))
    val bb = sig.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    def est(x: Long, y: Long): Double = BbitKernels.estimate(
      new GenericArrayData(bb(x).toArray), new GenericArrayData(bb(y).toArray), 128)
    val jNear = sh.as[(Long, Seq[String])].collect().toMap match {
      case m =>
        val (a, b) = (m(1L).toSet, m(2L).toSet)
        a.intersect(b).size.toDouble / a.union(b).size
    }
    assert(math.abs(est(1L, 2L) - jNear) < 0.3,
      s"est ${est(1L, 2L)} vs true $jNear")
    assert(est(1L, 3L) < 0.3, s"unrelated est ${est(1L, 3L)}")
  }

  test("b-bit prefiltered pipeline equals the plain LSH pipeline") {
    // well-separated corpus: disjoint per-doc vocabularies, so the
    // only pairs >= 0.5 are the planted drop-one-token mutations
    // (J ~ 0.9) — the margin regime the prefilter contracts for
    val docs = (0 until 60).map { i =>
      val toks = (0 until 30).map(t => s"d${i}_w$t")
      (i.toLong, toks.mkString(" "))
    }
    val d0 = docs.toDF("doc_id", "text")
    val mutated = d0.select((col("doc_id") + 1000).as("doc_id"),
      concat_ws(" ", slice(split(col("text"), " "), 2, 1000)).as("text"))
    val corpus = d0.unionByName(mutated)
    val plain = NearDup.nearDupPairs(corpus, "doc_id", "text", 0.5)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    val bbit = NearDup.bbitPrefilteredPairs(corpus, "doc_id", "text", 0.5)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    assert(bbit === plain)
    assert(bbit.nonEmpty)
  }
}
