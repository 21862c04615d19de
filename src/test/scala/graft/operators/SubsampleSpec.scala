package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.SubsampleKernel

/** SubsampleKernel / Subsample.subsampleCorpus (word2vec
  * frequency-aware token down-sampling).
  */
class SubsampleSpec extends SparkSpec {
  import spark.implicits._

  /** Driver replica of the per-occurrence draw. */
  private def u(seed: String, key: String, pos: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val h = d.digest(s"$seed:$key:$pos".getBytes("UTF-8"))
    val u48 = ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) |
      ((h(2) & 0xffL) << 24) | ((h(3) & 0xffL) << 16) |
      ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
    u48 / 281474976710656.0
  }

  test("thresholds >= 1 keep every occurrence (rare words are safe)") {
    val model = SubsampleKernel.toModel("s",
      Array("a", "b"), Array(1.0, 7.3))
    val r = SubsampleKernel.subsample(
      UTF8String.fromString("a b a b"), UTF8String.fromString("k1"), model)
    assert(r.getUTF8String(0).toString === "a b a b")
    assert(r.getInt(1) === 4 && r.getInt(2) === 4)
  }

  test("threshold 0 drops every occurrence of that word, keeps others") {
    val model = SubsampleKernel.toModel("s",
      Array("the", "rare"), Array(0.0, 2.0))
    val r = SubsampleKernel.subsample(
      UTF8String.fromString("the rare the the rare"),
      UTF8String.fromString("k"), model)
    assert(r.getUTF8String(0).toString === "rare rare")
    assert(r.getInt(1) === 2 && r.getInt(2) === 5)
  }

  test("kernel draw matches the md5-48 replica per (seed, doc, pos)") {
    // threshold between 0 and 1: occurrence i survives iff
    // u(seed, key, i) < thr — recompute on the driver and compare
    val thr = 0.5
    val model = SubsampleKernel.toModel("sd", Array("w"), Array(thr))
    val text = ("w " * 50).trim
    val r = SubsampleKernel.subsample(
      UTF8String.fromString(text), UTF8String.fromString("doc9"), model)
    val expectKept = (1 to 50).count(i => u("sd", "doc9", i) < thr)
    assert(r.getInt(1) === expectKept)
    assert(expectKept > 10 && expectKept < 40, s"draws look non-uniform: $expectKept")
  }

  test("subsampleCorpus: only words above the frequency threshold shrink") {
    // 'the' appears 400 times of 600 total; t = 1e-2 -> thr(the) =
    // sqrt(6/400) ~ 0.12, thr(x*) = sqrt(6/1) > 1 (each x_i unique)
    val docs = (0 until 200)
      .map(i => (i.toLong, s"the the x$i")).toDF("doc_id", "text")
    val out = Subsample.subsampleCorpus(docs, "doc_id", "text", "sX", t = 1e-2)
      .select("doc_id", "sub_text", "n_kept", "n_tokens").collect()
    assert(out.forall(_.getInt(3) === 3))
    // every unique x_i survives
    assert(out.forall(r => r.getString(1).contains("x" + r.getLong(0))))
    // 'the' keeps roughly its thr fraction: 400 occurrences * ~0.122
    val totalThe = out.map(_.getInt(2) - 1).sum // kept 'the' per doc
    assert(totalThe > 10 && totalThe < 120, s"'the' kept $totalThe of 400")
  }

  test("result is a pure function of (seed, id): repartitioning agrees") {
    val docs = (0 until 100)
      .map(i => (i.toLong, s"a b c d e f g h i$i")).toDF("doc_id", "text")
    val a = Subsample.subsampleCorpus(docs, "doc_id", "text", "sP", t = 1e-2)
      .select("doc_id", "sub_text").collect().sortBy(_.getLong(0))
    val b = Subsample.subsampleCorpus(docs.repartition(13), "doc_id", "text",
        "sP", t = 1e-2)
      .select("doc_id", "sub_text").collect().sortBy(_.getLong(0))
    assert(a.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      b.map(r => (r.getLong(0), r.getString(1))).toSeq)
  }
}
