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
}
