package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (SURVEY.md §2.5):
  * image/audio/video payloads ride as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extract / resize /
  * frame-sample run as batched per-partition transforms.
  *
  * The Spark-side plumbing here is real — schema, partitioning,
  * batch shape, null/corrupt handling — while the codec itself is a
  * STUB (`FakeCodec`): the container has no image/audio libraries, so
  * decode is a deterministic fake keyed on the payload bytes. The
  * production seam is explicit: every operator takes a [[MediaCodec]]
  * (constructor injection, default `FakeCodec`), so a real decoder
  * (JavaCV, TwelveMonkeys, ffmpeg-over-pipe) drops in per call site —
  * `FakeCodec` is a test fixture behind the same interface, not the
  * only implementation.
  *
  * Scale notes: `mapPartitions` keeps the codec's native buffers
  * per-partition rather than per-row (the Scala analogue of
  * `mapInPandas` batching); payload columns should be pruned out of
  * any plan that doesn't decode (parquet column pruning makes carrying
  * a 10 MB binary column free for metadata-only queries); decode
  * output is orders of magnitude wider than input, so repartition
  * BEFORE decoding to bound per-task memory.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("byte_len", LongType),
    StructField("format", StringType),       // sniffed container/codec
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
  ))

  /** The decode seam: implementations must be [[Serializable]] (the
    * instance ships inside task closures) and PURE — a function of the
    * payload bytes only — so re-run tasks (speculation, retries)
    * produce identical rows. Stateful native handles belong in lazy
    * per-JVM fields of the implementation, not in captured state.
    */
  trait MediaCodec extends Serializable {
    def sniffFormat(bytes: Array[Byte]): String
    def dims(bytes: Array[Byte]): (Int, Int)
    def durationMs(bytes: Array[Byte]): Long
    def features(bytes: Array[Byte]): Array[Float]
    def resize(bytes: Array[Byte], maxBytes: Int): Array[Byte]
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]]
  }

  /** Deterministic stand-in for a real decoder. Everything below is a
    * pure function of the payload bytes — stable across runs, engines
    * and partitionings.
    */
  object FakeCodec extends MediaCodec {
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else if (bytes.length >= 4 && new String(bytes.take(4), "ISO-8859-1") == "RIFF") "wav"
      else "bin"

    private def h(bytes: Array[Byte]): Long = {
      var x = 1125899906842597L
      var i = 0
      while (i < bytes.length) { x = 31 * x + bytes(i); i += 1 }
      x & Long.MaxValue
    }

    def dims(bytes: Array[Byte]): (Int, Int) = {
      val k = h(bytes)
      (64 + (k % 1217).toInt, 64 + ((k / 1217) % 977).toInt)
    }

    def durationMs(bytes: Array[Byte]): Long = 1000L + h(bytes) % 120000L

    /** 8-dim "feature vector" of the decoded payload. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val k = h(bytes)
      Array.tabulate(8)(i => (((k >> (i * 7)) & 0x7F).toInt - 64) / 64.0f)
    }

    /** "Resize": deterministic downsample of the payload bytes. */
    def resize(bytes: Array[Byte], maxBytes: Int): Array[Byte] =
      if (bytes.length <= maxBytes) bytes
      else {
        val step = bytes.length.toDouble / maxBytes
        Array.tabulate(maxBytes)(i => bytes((i * step).toInt))
      }

    /** "Frame sample": n evenly spaced pseudo-frames of a video payload. */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
      (0 until n).map { i =>
        val start = (bytes.length.toLong * i / math.max(n, 1)).toInt
        bytes.slice(start, math.min(start + 256, bytes.length))
      }
  }

  /** Attach the metadata struct (cheap: header sniffing only, no
    * decode — safe to run over the full corpus).
    */
  def withMetadata(df: DataFrame, payloadCol: String, mediaType: String,
                   codec: MediaCodec = FakeCodec): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", mediaMetaType))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) Array.emptyByteArray else r.getAs[Array[Byte]](idx)
        val (w, ht) = codec.dims(bytes)
        val meta = Row(mediaType, bytes.length.toLong, codec.sniffFormat(bytes),
          w, ht, codec.durationMs(bytes))
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(Encoders.row(schema))
  }

  /** Decode + feature-extract in partition batches. Corrupt payloads
    * (decode throws) yield a null feature column instead of failing
    * the task — at 100 TB some shard WILL be corrupt.
    */
  def withFeatures(df: DataFrame, payloadCol: String,
                   codec: MediaCodec = FakeCodec): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = true))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val feat =
          try {
            if (r.isNullAt(idx)) null
            else codec.features(r.getAs[Array[Byte]](idx)).toSeq
          } catch { case scala.util.control.NonFatal(_) => null }
        Row.fromSeq(r.toSeq :+ feat)
      }
    }(Encoders.row(schema))
  }

  /** Thumbnail/resize pass returning a bounded-size payload copy. */
  def withResized(df: DataFrame, payloadCol: String, maxBytes: Int,
                  codec: MediaCodec = FakeCodec): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("resized", BinaryType, nullable = true))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out = if (r.isNullAt(idx)) null
          else codec.resize(r.getAs[Array[Byte]](idx), maxBytes)
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(schema))
  }

  /** Explode a video payload into sampled frame rows
    * (id, frame_idx, frame_bytes).
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, n: Int,
                   codec: MediaCodec = FakeCodec): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.isNullAt(pIdx)) Iterator.empty
        else codec.sampleFrames(r.getAs[Array[Byte]](pIdx), n)
          .iterator.zipWithIndex.map { case (f, i) => Row(r.get(idIdx), i, f) }
      }
    }(Encoders.row(outSchema))
  }
}
