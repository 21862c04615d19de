package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 1, 2, 3, 4, 5, 6, 7, 8)
  private def df = Seq(
    (1L, jpeg),
    (2L, "RIFF....WAVE".getBytes("ISO-8859-1")),
    (3L, null.asInstanceOf[Array[Byte]]),
  ).toDF("id", "payload")

  test("withMetadata sniffs format and sizes without decoding") {
    val out = Multimodal.withMetadata(df, "payload", "image")
      .select($"id", $"meta.format", $"meta.byte_len")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out(0) === ((1L, "jpeg", 10L)))
    assert(out(1) === ((2L, "wav", 12L)))
    assert(out(2)._3 === 0L) // null payload → empty, not a crash
  }

  test("withFeatures: deterministic fixed-width vectors, null-safe") {
    val out = Multimodal.withFeatures(df, "payload")
      .select("id", "features").as[(Long, Option[Seq[Float]])].collect().sortBy(_._1)
    assert(out(0)._2.get.length === 8)
    assert(out(2)._2.isEmpty)
    val again = Multimodal.withFeatures(df, "payload")
      .select("id", "features").as[(Long, Option[Seq[Float]])].collect().sortBy(_._1)
    assert(out.toSeq === again.toSeq) // stable across runs
  }

  test("resize bounds payload size; frame sampling explodes rows") {
    val big = (1L, Array.fill[Byte](10000)(7)) :: Nil
    val resized = Multimodal.withResized(big.toDF("id", "payload"), "payload", 128)
      .select("resized").as[Array[Byte]].head()
    assert(resized.length === 128)
    val frames = Multimodal.sampleFrames(big.toDF("id", "payload"), "id", "payload", 4)
    assert(frames.count() === 4)
    assert(frames.select(max("frame_idx")).as[Int].head() === 3)
  }

  test("codec seam: a custom MediaCodec instance drives the plumbing") {
    // a trivial real-ish implementation, injected where FakeCodec is
    // the default — proves the production swap is one argument, and
    // that the instance survives the task-closure roundtrip
    object ConstCodec extends Multimodal.MediaCodec {
      def sniffFormat(b: Array[Byte]) = "const"
      def dims(b: Array[Byte]) = (1, 2)
      def durationMs(b: Array[Byte]) = 7L
      def features(b: Array[Byte]) = Array(b.length.toFloat)
      def resize(b: Array[Byte], m: Int) = b.take(m)
      def sampleFrames(b: Array[Byte], n: Int) = Seq.fill(n)(b)
    }
    val df = Seq((1L, Array[Byte](9, 9, 9))).toDF("id", "payload")
    val meta = Multimodal.withMetadata(df, "payload", "image", ConstCodec)
      .select("meta.format", "meta.width", "meta.duration_ms")
      .as[(String, Int, Long)].head()
    assert(meta === (("const", 1, 7L)))
    val feat = Multimodal.withFeatures(df, "payload", ConstCodec)
      .select("features").as[Seq[Float]].head()
    assert(feat === Seq(3.0f))
  }

  test("ImageIoCodec: real PNG roundtrip recovers planted dims and channel means") {
    val png = ImageIoCodec.constantPng(10, 6, 200, 50, 7)
    val df = Seq((1L, png), (2L, Array[Byte](1, 2, 3)), // garbage payload
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val meta = Multimodal.withMetadata(df, "payload", "image", ImageIoCodec)
      .select($"id", $"meta.format", $"meta.width", $"meta.height")
      .as[(Long, String, Int, Int)].collect().sortBy(_._1)
    assert(meta(0) === ((1L, "png", 10, 6)))
    assert(meta(1) === ((2L, "bin", -1, -1))) // corrupt degrades, no crash
    val feats = Multimodal.withFeatures(df, "payload", ImageIoCodec)
      .select("id", "features").as[(Long, Option[Seq[Float]])].collect().sortBy(_._1)
    val f = feats(0)._2.get
    assert(math.round(f(0) * 255) === 200 && math.round(f(1) * 255) === 50 &&
      math.round(f(2) * 255) === 7)
    assert(f(4) === 0.0f && f(5) === 0.0f && f(6) === 0.0f) // constant image: zero stddev
    assert(feats(1)._2.isEmpty && feats(2)._2.isEmpty) // corrupt/null → null features
  }

  test("WavCodec: real PCM roundtrip recovers planted channels/duration/amplitude") {
    val wav = WavCodec.squareWav(frames = 1600, sampleRate = 8000f,
      channels = 2, amplitude = 1234)
    val df = Seq((1L, wav), (2L, Array[Byte](1, 2, 3)),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val meta = Multimodal.withMetadata(df, "payload", "audio", WavCodec)
      .select($"id", $"meta.format", $"meta.width", $"meta.height", $"meta.duration_ms")
      .as[(Long, String, Int, Int, Long)].collect().sortBy(_._1)
    assert(meta(0) === ((1L, "wav", 2, 16, 200L))) // 1600 frames @ 8 kHz
    assert(meta(1) === ((2L, "bin", -1, -1, 0L)))  // corrupt degrades, no crash
    val feats = Multimodal.withFeatures(df, "payload", WavCodec)
      .select("id", "features").as[(Long, Option[Seq[Float]])].collect().sortBy(_._1)
    val f = feats(0)._2.get
    assert(math.round(f(0) * 32768) === 1234) // mean |sample| = amplitude, exact
    assert(math.round(f(3) * 32768) === 1234) // peak = amplitude
    assert(math.abs(f(2)) < 1e-6f)            // symmetric wave: zero DC offset
    assert(feats(1)._2.isEmpty && feats(2)._2.isEmpty)
  }

  test("WavCodec: resize is frame-aligned within budget; clip frames cover the stream") {
    val wav = WavCodec.squareWav(frames = 4000, sampleRate = 8000f,
      channels = 1, amplitude = 2000)
    val small = WavCodec.resize(wav, 1000)
    assert(small.length <= 1000)
    assert(WavCodec.sniffFormat(small) === "wav")
    assert(WavCodec.durationMs(small) > 0)
    val clips = WavCodec.sampleFrames(wav, 4)
    assert(clips.length === 4)
    assert(clips.forall(WavCodec.sniffFormat(_) == "wav"))
    // slices tile the stream: durations sum to the original 500 ms
    assert(clips.map(WavCodec.durationMs).sum === 500L)
    val cf = WavCodec.features(clips.head)
    assert(math.round(cf(0) * 32768) === 2000) // clips keep the planted amplitude
  }

  test("ImageIoCodec: resize fits the byte budget; strip frames decode to planted colors") {
    val png = ImageIoCodec.constantPng(256, 256, 10, 20, 30)
    val small = ImageIoCodec.resize(png, 500)
    assert(small.length <= 500 && small.length > 0)
    val (w, h) = ImageIoCodec.dims(small)
    assert(w >= 1 && h >= 1 && w < 256)
    // strips: full horizontal coverage, decoded pixels keep the color
    val frames = ImageIoCodec.sampleFrames(ImageIoCodec.constantPng(8, 9, 99, 0, 99), 4)
    assert(frames.length === 4)
    val dims = frames.map(ImageIoCodec.dims)
    assert(dims.forall(_._1 == 8) && dims.map(_._2).sum === 9)
    val f0 = ImageIoCodec.features(frames.head)
    assert(math.round(f0(0) * 255) === 99 && math.round(f0(1) * 255) === 0)
  }

  test("WavCodec.energyHash64: volume-invariant, localized edits flip only their bits") {
    val rnd = new scala.util.Random(19)
    val base = Array.fill(65 * 20)((rnd.nextInt(400) - 200).toShort)
    def wav(s: Array[Short]) = WavCodec.encodePcm16Wav(s, 8000f, 1)
    val h0 = WavCodec.energyHash64(wav(base))
    // volume re-encode: every sample ×2 → every energy ×4 → same signs
    val loud = base.map(v => (v * 2).toShort)
    assert(WavCodec.energyHash64(wav(loud)) === h0)
    // silence the LAST slice: only bit 63 (the e(64)>e(63) comparison)
    // can change
    val cut = base.clone()
    (64 * 20 until 65 * 20).foreach(i => cut(i) = 0)
    val h1 = WavCodec.energyHash64(wav(cut))
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 1)
    assert(((h0 ^ h1) & ~(1L << 63)) === 0L) // edit localized to bit 63
    // streams too short for 65 slices throw → NULL through withDHash
    intercept[Exception](WavCodec.energyHash64(wav(Array.fill(10)(5.toShort))))
  }
}
