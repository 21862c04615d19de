package graft.operators

import graft.SparkSpec

class GvidCodecSpec extends SparkSpec {
  import spark.implicits._

  private def clip(n: Int): Array[Byte] =
    GvidCodec.encode((0 until n).map(f =>
      ImageIoCodec.grayGridPng(Array.fill(72)(10 + f * 20), 2, 2)))

  test("mux/demux roundtrip: every embedded frame decodes via ImageIO") {
    val payload = clip(5)
    val fs = GvidCodec.frames(payload)
    assert(fs.size === 5)
    fs.zipWithIndex.foreach { case (f, i) =>
      assert(ImageIoCodec.luma9x8(f).toSeq === Seq.fill(72)(10 + i * 20))
    }
    assert(GvidCodec.sniffFormat(payload) === "gvid")
    assert(GvidCodec.durationMs(payload) === 5 * GvidCodec.FrameMs)
    assert(GvidCodec.dims(payload) === ((18, 16)))
  }

  test("corrupt payloads degrade (sniff/dims/duration), never throw") {
    for (bad <- Seq(Array[Byte](), Array[Byte](1, 2, 3),
        "GRAFTVID".getBytes("ISO-8859-1"), // magic, no count
        GvidCodec.encode(Seq(clip(1))).dropRight(3))) { // truncated frame
      assert(GvidCodec.sniffFormat(bad) === "bin")
      assert(GvidCodec.dims(bad) === ((-1, -1)))
      assert(GvidCodec.durationMs(bad) === 0L)
    }
  }

  test("resize drops frames to the budget; frame sampling is evenly spaced") {
    val payload = clip(8)
    val small = GvidCodec.resize(payload, payload.length / 2)
    assert(small.length <= payload.length / 2)
    assert(GvidCodec.frames(small).size < 8 && GvidCodec.frames(small).nonEmpty)
    val sampled = GvidCodec.sampleFrames(payload, 4)
    assert(sampled.size === 4)
    // sampled frames are the real embedded payloads, in temporal order
    assert(ImageIoCodec.luma9x8(sampled.head).head === 10)
    assert(ImageIoCodec.luma9x8(sampled.last).head > 10)
  }

  test("drives the Multimodal seam: metadata + frame explode") {
    val df = Seq((1L, clip(4)), (2L, Array[Byte](9, 9, 9))).toDF("id", "payload")
    val meta = Multimodal.withMetadata(df, "payload", "video", GvidCodec)
      .select($"id", $"meta.format", $"meta.duration_ms")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(meta(0) === ((1L, "gvid", 160L)))
    assert(meta(1)._2 === "bin")
    val frames = Multimodal.sampleFrames(
      df.filter($"id" === 1L), "id", "payload", 4, GvidCodec)
    assert(frames.count() === 4)
  }
}
