package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** PRODUCTION [[Multimodal.MediaCodec]] for AUDIO payloads, built on
  * the JDK's `javax.sound.sampled` (WAV/AIFF/AU readers ship with the
  * JRE — zero added dependencies, same argument as [[ImageIoCodec]]).
  * Together the two codecs make the multimodal seam real for the two
  * modalities the JDK can decode natively; video stays behind the
  * injectable interface for an external decoder.
  *
  * Codec contract (see [[Multimodal.MediaCodec]]):
  *  - PURE and memory-only: decodes from byte arrays, re-encodes to
  *    byte arrays; no tmp files, so speculative re-runs are identical.
  *  - CORRUPT-SAFE on the `withMetadata` path: [[sniffFormat]] /
  *    [[dims]] / [[durationMs]] degrade ("bin", (-1, -1), 0) on
  *    unparseable bytes instead of failing the task; the decode-heavy
  *    methods throw and rely on the operators' null-on-corrupt
  *    handling.
  *  - Audio reuses the image-oriented metadata struct fields:
  *    `dims` = (channels, bits per sample) — the two discrete shape
  *    parameters of a PCM stream — and `duration_ms` is exact frame
  *    count × 1000 / rate.
  *
  * Only PCM_SIGNED/PCM_UNSIGNED payloads are decoded (the JRE's WAV
  * reader's native range); compressed WAV variants throw and surface
  * as corrupt, which is the honest behavior for a stub-free codec
  * without external codec libraries.
  */
object WavCodec extends Multimodal.MediaCodec {

  private def fileFormat(bytes: Array[Byte]): Option[AudioFileFormat] =
    try Some(AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  private def open(bytes: Array[Byte]): AudioInputStream =
    AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))

  /** Decode the whole stream to 16-bit signed little-endian samples
    * (interleaved across channels). 8-bit and big-endian inputs are
    * converted through the JDK's format-conversion chain so feature
    * extraction sees ONE canonical sample space.
    */
  private def samples(bytes: Array[Byte]): (Array[Short], AudioFormat) = {
    val in = open(bytes)
    try {
      val src = in.getFormat
      val canonical = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels, 2 * src.getChannels,
        src.getSampleRate, false)
      val conv = AudioSystem.getAudioInputStream(canonical, in)
      try {
        val raw = conv.readAllBytes()
        val out = new Array[Short](raw.length / 2)
        var i = 0
        while (i < out.length) {
          out(i) = ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort
          i += 1
        }
        (out, src)
      } finally conv.close()
    } finally in.close()
  }

  /** PCM16 mono/stereo WAV encode — the fixture generator for
    * oracle-gated roundtrip queries (encode and decode exercise the
    * same javax.sound stack end-to-end, the q86 pattern).
    */
  def encodePcm16Wav(samples: Array[Short], sampleRate: Float,
      channels: Int): Array[Byte] = {
    require(channels >= 1, s"channels must be >= 1, got $channels")
    require(samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of channels $channels")
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xFF).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate, 16, channels, 2 * channels, sampleRate, false)
    val stream = new AudioInputStream(
      new ByteArrayInputStream(raw), fmt, samples.length / channels)
    val out = new ByteArrayOutputStream()
    try AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    finally stream.close()
    out.toByteArray
  }

  /** A constant-|amplitude| square wave (+a, −a alternating per
    * frame, all channels equal) — every decoded statistic is known in
    * closed form: mean |sample| = a exactly.
    */
  def squareWav(frames: Int, sampleRate: Float, channels: Int,
      amplitude: Short): Array[Byte] = {
    val s = new Array[Short](frames * channels)
    var f = 0
    while (f < frames) {
      val v = if (f % 2 == 0) amplitude else (-amplitude).toShort
      var c = 0
      while (c < channels) { s(f * channels + c) = v; c += 1 }
      f += 1
    }
    encodePcm16Wav(s, sampleRate, channels)
  }

  def sniffFormat(bytes: Array[Byte]): String =
    fileFormat(bytes).map(_.getType.getExtension.toLowerCase).getOrElse("bin")

  /** (channels, bits per sample) — header-only; (-1, -1) when
    * unreadable.
    */
  def dims(bytes: Array[Byte]): (Int, Int) =
    fileFormat(bytes).map { f =>
      (f.getFormat.getChannels, f.getFormat.getSampleSizeInBits)
    }.getOrElse((-1, -1))

  /** Exact frame count × 1000 / rate, floored; 0 when unreadable. */
  def durationMs(bytes: Array[Byte]): Long =
    fileFormat(bytes).map { f =>
      if (f.getFrameLength < 0 || f.getFormat.getFrameRate <= 0) 0L
      else f.getFrameLength * 1000L / f.getFormat.getFrameRate.toLong
    }.getOrElse(0L)

  /** 8-dim PCM statistics, normalized to [−1, 1] by 32768 (the
    * 16-bit full scale): mean |sample|, RMS, mean sample (DC offset),
    * peak |sample|, zero-crossing fraction, channels/8 (bounded shape
    * proxy), log10(frames)/10, mean of first channel only. Integer
    * sums throughout; only the final normalization is floating point,
    * so planted square waves recover their amplitude exactly.
    */
  def features(bytes: Array[Byte]): Array[Float] = {
    val (s, fmt) = samples(bytes)
    if (s.isEmpty)
      throw new javax.sound.sampled.UnsupportedAudioFileException("empty stream")
    val n = s.length
    var sumAbs, sum = 0L
    var sumSq = 0L
    var peak = 0
    var zc = 0
    var i = 0
    while (i < n) {
      val v = s(i).toInt
      sumAbs += math.abs(v); sum += v; sumSq += v.toLong * v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zc += 1
      i += 1
    }
    val ch = fmt.getChannels
    var c0sum = 0L
    var j = 0
    while (j < n) { c0sum += s(j); j += ch }
    val frames = n / ch
    Array(
      (sumAbs.toDouble / n / 32768.0).toFloat,
      (math.sqrt(sumSq.toDouble / n) / 32768.0).toFloat,
      (sum.toDouble / n / 32768.0).toFloat,
      (peak / 32768.0).toFloat,
      (zc.toDouble / math.max(1, n - 1)).toFloat,
      (ch / 8.0).toFloat,
      (math.log10(math.max(1, frames).toDouble) / 10.0).toFloat,
      (c0sum.toDouble / math.max(1, frames) / 32768.0).toFloat)
  }

  /** 64-bit energy-delta audio fingerprint — the perceptual-hash
    * shape of classic audio fingerprinting (Haitsma & Kalker, "A
    * Highly Robust Audio Fingerprint System", ISMIR 2002: sign of
    * energy differences between adjacent time/frequency bands),
    * reduced to the time axis: the decoded stream splits into 65
    * equal slices, slice energy is the EXACT integer Σ sample²
    * (longs — no FP anywhere), and bit f (0..63, at position `1L<<f`)
    * is set iff energy(f+1) > energy(f). Amplitude scaling multiplies
    * every energy by the same constant, so re-encodes/volume changes
    * hash to distance 0; a localized edit flips only its
    * neighborhood's bits — feed [[PerceptualHash.nearDupPairs]]'s
    * banded Hamming join via `withDHash(hasher = WavCodec.energyHash64)`.
    * Trailing samples beyond 65·⌊n/65⌋ are ignored; streams shorter
    * than 65 samples throw (no evidence → NULL hash upstream).
    */
  def energyHash64(bytes: Array[Byte]): Long = {
    val (s, _) = samples(bytes)
    val spf = s.length / 65
    if (spf == 0)
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        s"need >= 65 samples for the 65-slice energy hash, got ${s.length}")
    val e = new Array[Long](65)
    var f = 0
    while (f < 65) {
      var acc = 0L
      var i = f * spf
      val end = i + spf
      while (i < end) { acc += s(i).toLong * s(i); i += 1 }
      e(f) = acc
      f += 1
    }
    var h = 0L
    f = 0
    while (f < 64) {
      if (e(f + 1) > e(f)) h |= 1L << f
      f += 1
    }
    h
  }

  /** Truncate to a byte budget: keep the longest frame-aligned prefix
    * whose WAV re-encode fits (header is 44 bytes + 2·ch per frame —
    * exact arithmetic, no trial loop). Payloads inside the budget
    * pass through untouched.
    */
  def resize(bytes: Array[Byte], maxBytes: Int): Array[Byte] = {
    if (bytes.length <= maxBytes) return bytes
    val (s, fmt) = samples(bytes)
    val ch = fmt.getChannels
    val headroom = maxBytes - 44
    val keepFrames = math.max(1, headroom / (2 * ch))
    val out = encodePcm16Wav(s.take(keepFrames * ch), fmt.getSampleRate, ch)
    if (out.length <= maxBytes) out
    else encodePcm16Wav(s.take(ch), fmt.getSampleRate, ch) // 1-frame floor
  }

  /** "Frames" of an audio payload: n contiguous time slices re-encoded
    * as standalone WAVs — the clip-sampling shape an audio pipeline
    * feeds to feature extractors, exercised with real decoded PCM.
    */
  def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val (s, fmt) = samples(bytes)
    val ch = fmt.getChannels
    val frames = s.length / ch
    (0 until n).map { i =>
      val f0 = math.min((frames.toLong * i / math.max(n, 1)).toInt, frames - 1)
      val f1 = math.max(f0 + 1, math.min((frames.toLong * (i + 1) / math.max(n, 1)).toInt, frames))
      encodePcm16Wav(s.slice(f0 * ch, f1 * ch), fmt.getSampleRate, ch)
    }
  }
}
