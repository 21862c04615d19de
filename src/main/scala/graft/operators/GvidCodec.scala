package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** PRODUCTION [[Multimodal.MediaCodec]] for VIDEO at the container
  * level. Real-world codecs (H.264/VP9) need native decoders this
  * container image doesn't ship — those stay behind the injectable
  * seam, documented — but everything a training pipeline does AROUND
  * the codec is container work: demux, frame extraction, header
  * metadata, frame sampling, size-budget re-encode. This codec makes
  * that layer REAL over a minimal open container (`GRAFTVID`: magic,
  * frame count, length-prefixed PNG frames — an MJPEG-style
  * intra-only layout), with every extracted frame decodable by the
  * production [[ImageIoCodec]] stack. Swapping in an ffmpeg-backed
  * implementation changes only the demux arithmetic; the operator
  * plumbing, schemas and query shapes are exercised end to end here.
  *
  * Codec contract ([[Multimodal.MediaCodec]]): PURE functions of the
  * payload; [[sniffFormat]]/[[dims]]/[[durationMs]] corrupt-safe
  * (degrade, never throw); [[dims]] is header-only — it reads the
  * FIRST frame's PNG header without decoding any raster.
  */
object GvidCodec extends Multimodal.MediaCodec {

  private val Magic = "GRAFTVID".getBytes("ISO-8859-1")
  /** Fixed 25 fps — duration is a pure function of the frame count. */
  val FrameMs = 40L

  /** Mux PNG frames into a container payload. */
  def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Magic)
    val n = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(frames.size)
    out.write(n.array())
    frames.foreach { f =>
      val len = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(f.length)
      out.write(len.array())
      out.write(f)
    }
    out.toByteArray
  }

  /** Demux: Some(embedded frame payloads) — possibly empty for a
    * structurally valid zero-frame container — or None on a
    * corrupt/foreign container (bad magic, truncated length prefix,
    * frame running past the end). Separating 'empty' from 'corrupt'
    * is what lets [[sniffFormat]] classify encode(Nil) correctly.
    */
  def demux(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes.length < Magic.length + 4) return None
    var i = 0
    while (i < Magic.length) {
      if (bytes(i) != Magic(i)) return None
      i += 1
    }
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    buf.position(Magic.length)
    val n = buf.getInt
    if (n < 0 || n > 1000000) return None
    val out = Seq.newBuilder[Array[Byte]]
    var k = 0
    while (k < n) {
      if (buf.remaining() < 4) return None
      val len = buf.getInt
      if (len < 0 || len > buf.remaining()) return None
      val f = new Array[Byte](len)
      buf.get(f)
      out += f
      k += 1
    }
    Some(out.result())
  }

  /** The embedded frame payloads, or Nil on a corrupt/foreign OR
    * zero-frame container (callers that need the distinction use
    * [[demux]]).
    */
  def frames(bytes: Array[Byte]): Seq[Array[Byte]] = demux(bytes).getOrElse(Nil)

  /** Magic + header structure decide the format — a valid zero-frame
    * container IS a gvid (empty ≠ corrupt).
    */
  def sniffFormat(bytes: Array[Byte]): String =
    if (demux(bytes).isDefined) "gvid" else "bin"

  /** Header-only: demux walks length prefixes (no raster decode) and
    * the first frame's dims come from its PNG header via the
    * [[ImageIoCodec]] header reader.
    */
  def dims(bytes: Array[Byte]): (Int, Int) = {
    val fs = frames(bytes)
    if (fs.isEmpty) (-1, -1) else ImageIoCodec.dims(fs.head)
  }

  def durationMs(bytes: Array[Byte]): Long = frames(bytes).size * FrameMs

  /** Features of the temporal MIDDLE frame (the standard cheap clip
    * descriptor); throws on undecodable frames like the image codec —
    * operators catch per-row.
    */
  def features(bytes: Array[Byte]): Array[Float] = {
    val fs = frames(bytes)
    if (fs.isEmpty)
      throw new javax.imageio.IIOException("not a GRAFTVID payload")
    ImageIoCodec.features(fs(fs.size / 2))
  }

  /** Re-encode within a byte budget by dropping every other frame
    * (temporal downsample) until it fits; a 1-frame clip that still
    * exceeds the budget delegates to the image codec's spatial
    * resize.
    */
  def resize(bytes: Array[Byte], maxBytes: Int): Array[Byte] = {
    if (bytes.length <= maxBytes) return bytes
    var fs = frames(bytes)
    if (fs.isEmpty)
      throw new javax.imageio.IIOException("not a GRAFTVID payload")
    var out = bytes
    while (out.length > maxBytes && fs.size > 1) {
      fs = fs.zipWithIndex.collect { case (f, i) if i % 2 == 0 => f }
      out = encode(fs)
    }
    if (out.length > maxBytes) encode(Seq(ImageIoCodec.resize(fs.head, maxBytes - 16)))
    else out
  }

  /** n evenly spaced REAL frames (the (id, frame_idx, bytes) explode
    * shape, with actual embedded PNGs — each decodable by
    * [[ImageIoCodec]]).
    */
  def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val fs = frames(bytes)
    if (fs.isEmpty)
      throw new javax.imageio.IIOException("not a GRAFTVID payload")
    (0 until n).map(i => fs(math.min((fs.size.toLong * i / math.max(n, 1)).toInt, fs.size - 1)))
  }
}
