package graft.operators

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  /** The closed-form dHash the decoded-pixel path must reproduce. */
  private def expectedHash(cells: Array[Int]): Long = {
    var h = 0L
    for (cy <- 0 until 8; cx <- 0 until 8)
      if (cells(cy * 9 + cx) > cells(cy * 9 + cx + 1)) h |= 1L << (cy * 8 + cx)
    h
  }

  test("dHash64 through real PNG encode/decode equals the closed form") {
    val rnd = new Random(42)
    for (_ <- 1 to 20) {
      val cells = Array.fill(72)(rnd.nextInt(256))
      val cellW = 1 + rnd.nextInt(3)
      val cellH = 1 + rnd.nextInt(3)
      val png = ImageIoCodec.grayGridPng(cells, cellW, cellH)
      assert(ImageIoCodec.luma9x8(png).toSeq === cells.toSeq,
        "area-average must recover planted cells exactly")
      assert(ImageIoCodec.dHash64(png) === expectedHash(cells))
    }
  }

  test("dHash is invariant to global brightness shift and rescale") {
    val rnd = new Random(7)
    val cells = Array.fill(72)(20 + rnd.nextInt(200))
    val base = ImageIoCodec.dHash64(ImageIoCodec.grayGridPng(cells, 2, 2))
    val brighter = ImageIoCodec.dHash64(
      ImageIoCodec.grayGridPng(cells.map(_ + 30), 2, 2))
    val larger = ImageIoCodec.dHash64(ImageIoCodec.grayGridPng(cells, 5, 4))
    assert(brighter === base)
    assert(larger === base)
  }

  test("withDHash: corrupt payloads hash to NULL, not a task failure") {
    val good = ImageIoCodec.grayGridPng(Array.fill(72)(99), 2, 2)
    val df = Seq(
      (1L, good),
      (2L, Array[Byte](1, 2, 3)),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val out = PerceptualHash.withDHash(df, "payload")
      .select("id", "dhash").as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(out(0)._2.isDefined)
    assert(out(1)._2.isEmpty)
    assert(out(2)._2.isEmpty)
  }

  test("nearDupPairs matches brute force exactly for maxHamming < bands") {
    val rnd = new Random(1234)
    // cluster structure: 40 seeds, each with a few <=3-bit mutations,
    // plus pure-noise hashes
    val seeds = Array.fill(40)(rnd.nextLong())
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var id = 0L
    for (s <- seeds) {
      rows += ((id, s)); id += 1
      for (_ <- 0 until rnd.nextInt(3)) {
        var m = s
        for (_ <- 0 to rnd.nextInt(3)) m ^= 1L << rnd.nextInt(64)
        rows += ((id, m)); id += 1
      }
    }
    for (_ <- 0 until 30) { rows += ((id, rnd.nextLong())); id += 1 }
    val df = rows.toSeq.toDF("id", "h")
    val got = PerceptualHash.nearDupPairs(df, "id", "h", maxHamming = 3, bands = 4)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    val brute = (for {
      (ia, ha) <- rows
      (ib, hb) <- rows
      if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got === brute, "pigeonhole banding must have exact recall")
    graft.core.OpCache.release()
  }

  test("nearDupPairs rejects a radius the band count cannot guarantee") {
    val df = Seq((1L, 1L)).toDF("id", "h")
    intercept[IllegalArgumentException] {
      PerceptualHash.nearDupPairs(df, "id", "h", maxHamming = 4, bands = 4)
    }
    intercept[IllegalArgumentException] {
      PerceptualHash.nearDupPairs(df, "id", "h", maxHamming = 1, bands = 7)
    }
  }
}
