package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` payloads + typed metadata, with decode / feature-extraction /
  * frame-sampling as per-partition batch transforms.
  *
  * Spark-side design (the part that must be real at 100 TB):
  *  - media rows carry `bytes: Array[Byte]` (parquet BINARY) — scans
  *    prune the column unless a stage actually touches pixels;
  *  - decode runs via typed-`Dataset` `mapPartitions` — the per-partition
  *    batch shape (iterator-in/iterator-out) is exactly what lets a real
  *    decoder amortize model/codec init once per partition, the same
  *    contract `mapInPandas` gives Python;
  *  - partitioning: repartition on media_id upstream bounds any
  *    decoder's working set per task.
  *
  * Decode kernels: the IMAGE path is REAL (`javax.imageio`, JDK-native —
  * PNG/JPEG/GIF pixels actually parsed, see [[MediaDecoder.decodeImage]]);
  * audio/video codecs are not in this container, so those kinds run a
  * deterministic fake ([[MediaDecoder.fakeDecode]]) that keeps the
  * plumbing (schema, batching, explode of variable-length frame output)
  * fully testable. Swap the fake for a real codec to go live.
  */
final case class MediaRow(
    media_id: Long,
    kind: String,          // image | audio | video
    mime: String,
    bytes: Array[Byte])

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,            // fake-decoded dims (stub)
    height: Int,
    n_frames: Int,
    content_hash: Long)

final case class FrameSample(
    media_id: Long,
    frame_idx: Int,
    frame_hash: Long)

final case class ImageFeatures(
    media_id: Long,
    width: Int,
    height: Int,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long)

final case class AudioInfo(nSamples: Long, sampleRate: Int,
    channels: Int, sumSamples: Long)

final case class AudioFeatures(
    media_id: Long,
    n_samples: Long,
    sample_rate: Int,
    channels: Int,
    sum_samples: Long)

/** Deterministic mono 16-bit PCM WAV generator: sample i of clip `id` is
  * pure integer arithmetic on (id, i), so an oracle that never sees the
  * bytes predicts the sample count AND the exact sum a correct decoder
  * must recover. The bytes are written as a raw RIFF container here and
  * decoded through the JDK's `javax.sound.sampled` parser — generation
  * and decode share no code, so the round-trip exercises a real codec
  * path. */
object AudioGen {
  val SampleRate = 8000

  def nSamples(id: Long): Int = 400 + (id % 600).toInt

  /** 16-bit signed sample value; spans the full range deterministically. */
  def sample(id: Long, i: Int): Int =
    (((i.toLong * 31 + id * 7) % 65536) - 32768).toInt

  def wav(id: Long): Array[Byte] = {
    val n = nSamples(id)
    val dataLen = n * 2 // mono, 16-bit
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                    // PCM
      .putShort(1)                    // mono
      .putInt(SampleRate)
      .putInt(SampleRate * 2)         // byte rate
      .putShort(2)                    // block align
      .putShort(16)                   // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { buf.putShort(sample(id, i).toShort); i += 1 }
    buf.array()
  }
}

final case class VideoDemux(timescale: Int, duration: Long,
    frameSizes: Seq[Int], mdat: Array[Byte])

final case class VideoFrame(
    media_id: Long,
    frame_idx: Int,
    frame_len: Int,
    frame_bytes: Array[Byte])

/** Deterministic minimal-but-valid MP4 (ISO-BMFF) generator: a real box
  * tree — ftyp, moov/mvhd (timescale + duration), the sample-size table
  * nested at its standard moov/trak/mdia/minf/stbl/stsz location, and an
  * mdat whose payload is the concatenated frame bytes. Frame count,
  * sizes, and every payload byte are integer arithmetic on (id, frame,
  * offset), so an oracle predicts what a correct DEMUX must extract.
  * Demux (container parsing, [[MediaDecoder.demuxMp4]]) is the real
  * pre-decode stage of every video pipeline; codec decode of the frame
  * payloads stays out of scope (no codecs in the container). */
object VideoGen {
  val Timescale = 1000

  def duration(id: Long): Long = 1000 + id % 9000
  def nFrames(id: Long): Int = 2 + (id % 7).toInt
  def frameLen(id: Long, i: Int): Int = 50 + ((id + i * 13L) % 100).toInt
  def frameByte(id: Long, i: Int, j: Int): Int =
    ((id + i * 17L + j * 29L) % 256).toInt

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + payload.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII"))
      .put(payload)
    buf.array()
  }

  def mp4(id: Long): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
        "isom".getBytes("US-ASCII"))
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(0)                 // version + flags
        .putInt(0).putInt(0)      // creation / modification
        .putInt(Timescale)
        .putInt(duration(id).toInt)
        .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
        .putLong(0)               // reserved
      // unity matrix
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt)
      (1 to 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(2)                 // next_track_ID
      box("mvhd", b.array())
    }
    val n = nFrames(id)
    val stsz = {
      val b = java.nio.ByteBuffer.allocate(12 + 4 * n)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(0)        // version + flags
        .putInt(0)       // sample_size = 0 → per-sample table
        .putInt(n)
      (0 until n).foreach(i => b.putInt(frameLen(id, i)))
      box("stsz", b.array())
    }
    val stbl = box("stbl", stsz)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", mdia)
    val moov = box("moov", mvhd ++ trak)
    val frames = (0 until n).flatMap { i =>
      (0 until frameLen(id, i)).map(j => frameByte(id, i, j).toByte)
    }.toArray
    ftyp ++ moov ++ box("mdat", frames)
  }
}

/** Deterministic tiny-PNG generator: dims and every pixel are pure
  * integer arithmetic on (media_id, x, y), so an oracle that never sees
  * the bytes can still predict exactly what a CORRECT decoder must
  * recover from them. PNG is lossless and `TYPE_INT_RGB` carries the
  * channels verbatim — encode→decode round-trips pixels bit-exactly. */
object ImageGen {
  javax.imageio.ImageIO.setUseCache(false) // see MediaDecoder — no temp files

  def dims(id: Long): (Int, Int) =
    (8 + (id % 9).toInt, 8 + ((id / 9) % 9).toInt)

  /** Channel values of pixel (x, y); all terms non-negative. */
  def rgb(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((x * 7 + y * 13 + id) % 256).toInt,
    ((x * 3 + y * 5 + 2 * id) % 256).toInt,
    ((x * 11 + y + 3 * id) % 256).toInt)

  def png(id: Long): Array[Byte] = {
    val (w, h) = dims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}

/** Pixel-level facts of a decoded still image: dimensions plus per-channel
  * pixel sums. The sums are the auditable part — any other decoder (or an
  * oracle that knows the generation rule) can recompute them, so a match
  * proves the decode read the actual pixels, not just the header. */
final case class ImageInfo(width: Int, height: Int,
    sumR: Long, sumG: Long, sumB: Long)

/** Block-mean perceptual hash of a decoded image, split into 32-bit
  * halves so SQL-side reassembly stays in non-negative BIGINTs. */
final case class ImagePhash(width: Int, height: Int,
    hashHi: Long, hashLo: Long)

/** Signal statistics of a decoded PCM clip — all exact integers except
  * the RMS, which is one division + one sqrt downstream. */
final case class AudioStats(nSamples: Long, sumAbs: Long, sumSq: Long,
    peak: Long, zeroCrossings: Long)

/** One cell of a ViT-style patch grid over a decoded image: exact gray
  * sum + pixel count per patch (means stay downstream as exact integer
  * cross-multiplication / scaled division). */
final case class ImagePatch(width: Int, height: Int, patch: Int,
    psum: Long, pcnt: Long)

/** Media decoders. The IMAGE path is real — `javax.imageio` ships with the
  * JDK and handles PNG/JPEG/BMP/GIF, no container dependencies needed.
  * Audio/video codecs are NOT in this container, so those kinds fall back
  * to [[fakeDecode]], a deterministic stand-in that keeps the pipeline
  * plumbing (schema, batching, frame explode) testable end-to-end; swap it
  * for a real codec (JNI/javacv/...) to go live. */
object MediaDecoder {

  // ImageIO defaults to FILE-backed stream caching: every read/write
  // creates (and deletes) a temp file. For in-memory byte arrays that is
  // pure overhead — measured ~30% of mm_image_decode at sf0.1 — and at
  // cluster scale it hammers executor local disks. Memory caching only.
  javax.imageio.ImageIO.setUseCache(false)

  // AudioSystem.getAudioInputStream does a PROVIDER LOOKUP on every
  // call, and the JDK's provider registry getter is a synchronized
  // static (JDK13Services.getProviders) — a JVM-GLOBAL lock that
  // serializes every decode thread on the executor (measured: the
  // mm_audio family ran 23x instead of 10x at the x10 tier with 31
  // cores idle). Load the SPI readers ONCE; each reader's own
  // getAudioInputStream is lock-free header parsing. The production
  // rule: per-row codec-FACTORY lookups hide global locks — hoist the
  // factory, keep the per-row decode.
  // WAVE reader FIRST: the service-loader order leads with the MIDI
  // readers, and every MIDI REJECTION of a WAV payload itself calls
  // MidiSystem.getProviders — the same synchronized global — so the
  // lock moved from our lookup into the probe chain (stack-dumped:
  // SoftMidiAudioFileReader.getAudioInputStream → JDK13Services).
  // With the accepting reader in front, a RIFF/WAVE payload never
  // reaches a prober that locks.
  private lazy val audioReaders
      : Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
      .sortBy(r => if (r.getClass.getName.contains("Wave")) 0 else 1)
  }

  /** Lock-free replacement for AudioSystem.getAudioInputStream over
    * in-memory bytes: try each cached reader (the AudioSystem contract,
    * minus its synchronized registry getter). */
  private def openAudio(bytes: Array[Byte])
      : javax.sound.sampled.AudioInputStream = {
    val it = audioReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      try return r.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
      }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no cached reader accepts the payload")
  }

  private def startsWith(bytes: Array[Byte], magic: Int*): Boolean =
    bytes.length >= magic.length &&
      magic.zipWithIndex.forall { case (m, i) => (bytes(i) & 0xff) == m }

  /** Content sniff BEFORE handing bytes to a parser: only formats whose
    * magic we trust (PNG/JPEG/GIF). This is a safety gate, not an
    * optimization — ImageIO's BMP probe accepts anything starting "BM",
    * so an arbitrary binary payload could reach a parser that allocates
    * whatever a garbage header declares. At 100 TB of untrusted payloads
    * that is an executor-OOM vector; unknown magic → stub path instead. */
  def looksLikeImage(bytes: Array[Byte]): Boolean =
    startsWith(bytes, 0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ||
      startsWith(bytes, 0xff, 0xd8, 0xff) ||
      startsWith(bytes, 'G', 'I', 'F', '8')

  /** Real still-image decode: full pixel pass, not just a header sniff.
    * Returns None for bytes that fail the magic gate or that no
    * registered reader parses — callers fall back to the stub path,
    * mirroring how a production pipeline quarantines undecodable
    * payloads instead of failing the job. */
  def decodeImage(bytes: Array[Byte]): Option[ImageInfo] =
    try {
      if (!looksLikeImage(bytes)) None
      else Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        ImageInfo(w, h, sr, sg, sb)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Block-mean perceptual hash (Yang et al. 2006) over REAL decoded
    * pixels: the image is cut into the 8×8 grid of blocks
    * `(x*8/w, y*8/h)` (integer division — every block non-empty for
    * w,h ≥ 8), and bit `by*8+bx` is set when the block's mean gray
    * (r+g+b) exceeds the image mean. The comparison is exact integer
    * cross-multiplication (`bsum·N > tsum·bcnt`) — no float means, so
    * an oracle that knows the pixel rule replays the hash bit-for-bit.
    * Returned as two 32-bit halves to keep SQL-side reassembly inside
    * non-negative BIGINT arithmetic. */
  def imagePhash(bytes: Array[Byte]): Option[ImagePhash] =
    try {
      if (!looksLikeImage(bytes)) None
      else Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val bsum = new Array[Long](64)
        val bcnt = new Array[Long](64)
        var tsum = 0L
        var y = 0
        while (y < h) {
          val by = y * 8 / h
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val gray = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            val b = by * 8 + x * 8 / w
            bsum(b) += gray; bcnt(b) += 1; tsum += gray
            x += 1
          }
          y += 1
        }
        val tcnt = w.toLong * h
        var (hi, lo) = (0L, 0L)
        var b = 0
        while (b < 64) {
          if (bsum(b) * tcnt > tsum * bcnt(b)) {
            if (b >= 32) hi |= 1L << (b - 32) else lo |= 1L << b
          }
          b += 1
        }
        ImagePhash(w, h, hi, lo)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** ViT-style patch grid over REAL decoded pixels: the image is cut
    * into the 4×4 grid of patches `(y*4/h)*4 + x*4/w` (integer division
    * — every patch non-empty for w,h ≥ 4) and each patch accumulates its
    * exact gray (r+g+b) sum and pixel count. This is the batching shape
    * a vision tower consumes; downstream brightness/contrast stays in
    * exact integer arithmetic so a rule-replaying oracle matches
    * bit-for-bit. */
  def imagePatches(bytes: Array[Byte]): Option[Seq[ImagePatch]] =
    try {
      if (!looksLikeImage(bytes)) None
      else Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val psum = new Array[Long](16)
        val pcnt = new Array[Long](16)
        var y = 0
        while (y < h) {
          val py = y * 4 / h
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val gray = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            val idx = py * 4 + x * 4 / w
            psum(idx) += gray; pcnt(idx) += 1
            x += 1
          }
          y += 1
        }
        (0 until 16).map(i => ImagePatch(w, h, i, psum(i), pcnt(i)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-frame signal energies of a decoded PCM clip: consecutive
    * non-overlapping frames of `frameLen` samples (tail < frameLen
    * dropped — the fixed-window convention), each reduced to its exact
    * Σv² energy. The voice-activity gate downstream compares these
    * against a threshold in pure integer arithmetic. Frames are
    * accumulated across read-buffer boundaries, so the result is
    * independent of the JDK stream's chunking. */
  def audioFrameEnergies(bytes: Array[Byte],
      frameLen: Int = 160): Option[Array[Long]] =
    try {
      if (!(startsWith(bytes, 'R', 'I', 'F', 'F') && bytes.length >= 12 &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' &&
          bytes(11) == 'E')) None
      else {
        val in = openAudio(bytes)
        try {
          val fmt = in.getFormat
          // the sample loop below reads 16-bit little-endian frames and,
          // on multi-channel audio, only the LEFT channel (offset 0 of
          // each frame) — any other sample width would misalign the hi
          // byte and read stale buffer bytes, so gate instead of
          // producing silently wrong energies
          if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) return None
          val frameSize = fmt.getFrameSize
          val buf = new Array[Byte](65536 - 65536 % frameSize)
          val energies = scala.collection.mutable.ArrayBuffer.empty[Long]
          var acc = 0L
          var inFrame = 0
          var read = in.read(buf)
          while (read > 0) {
            val full = read - read % frameSize
            var p = 0
            while (p < full) {
              val lo = buf(p) & 0xff
              val hi = buf(p + 1)
              val v = (hi << 8) | lo
              acc += v.toLong * v
              inFrame += 1
              if (inFrame == frameLen) {
                energies += acc; acc = 0L; inFrame = 0
              }
              p += frameSize
            }
            read = in.read(buf)
          }
          Some(energies.toArray) // tail partial frame intentionally dropped
        } finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real WAV decode via the JDK's `javax.sound.sampled` (PCM parsing
    * ships with the JRE — no container dependencies): full sample pass
    * summing 16-bit values, not just a header read. Magic-gated like
    * images (RIFF....WAVE); anything else → None → stub path. */
  def decodeAudio(bytes: Array[Byte]): Option[AudioInfo] =
    try {
      if (!(startsWith(bytes, 'R', 'I', 'F', 'F') && bytes.length >= 12 &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' &&
          bytes(11) == 'E')) None
      else {
        val in = openAudio(bytes)
        try {
          val fmt = in.getFormat
          val channels = fmt.getChannels
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          val frameSize = fmt.getFrameSize
          // chunked reads: one stream call per ~64 KB, not per 2-byte
          // frame — the frame-at-a-time loop was the measured GC/call
          // hot spot at the sf1 tier (1.7× over linear)
          val buf = new Array[Byte](65536 - 65536 % frameSize)
          var (count, sum) = (0L, 0L)
          var read = in.read(buf)
          while (read > 0) {
            val full = read - read % frameSize
            var p = 0
            while (p < full) {
              // mono 16-bit little-endian PCM (what AudioGen emits)
              var ch = 0
              while (ch < channels) {
                val off = p + ch * bytesPerSample
                val lo = buf(off) & 0xff
                val hi = buf(off + 1)
                sum += (hi << 8) | lo
                ch += 1
              }
              count += 1
              p += frameSize
            }
            read = in.read(buf)
          }
          Some(AudioInfo(count, fmt.getSampleRate.toInt, channels, sum))
        } finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Signal statistics over the full PCM pass (mono 16-bit): abs-sum,
    * square-sum, peak, and sign-change count — the feature set an audio
    * curation pipeline thresholds on (silence, clipping, noisiness).
    * All integers, so an oracle that knows the sample rule replays them
    * exactly; crossing state carries across chunk boundaries. */
  def decodeAudioStats(bytes: Array[Byte]): Option[AudioStats] =
    try {
      if (!(startsWith(bytes, 'R', 'I', 'F', 'F') && bytes.length >= 12 &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' &&
          bytes(11) == 'E')) None
      else {
        val in = openAudio(bytes)
        try {
          val fmt = in.getFormat
          // same 16-bit-little-endian contract as audioFrameEnergies:
          // other widths would misparse, so quarantine them to None
          if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) return None
          val frameSize = fmt.getFrameSize
          val buf = new Array[Byte](65536 - 65536 % frameSize)
          var (count, sumAbs, sumSq, peak, zc) = (0L, 0L, 0L, 0L, 0L)
          var prevNonNeg = false
          var read = in.read(buf)
          while (read > 0) {
            val full = read - read % frameSize
            var p = 0
            while (p < full) {
              val lo = buf(p) & 0xff
              val hi = buf(p + 1)
              val v = (hi << 8) | lo
              val a = math.abs(v.toLong)
              sumAbs += a; sumSq += v.toLong * v
              if (a > peak) peak = a
              val nonNeg = v >= 0
              if (count > 0 && nonNeg != prevNonNeg) zc += 1
              prevNonNeg = nonNeg
              count += 1
              p += frameSize
            }
            read = in.read(buf)
          }
          Some(AudioStats(count, sumAbs, sumSq, peak, zc))
        } finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real ISO-BMFF (MP4) DEMUX: walks the box tree (big-endian
    * size+type headers, recursive descent into container boxes), reads
    * timescale/duration from `mvhd`, the per-sample size table from its
    * nested `stsz`, and slices the `mdat` payload into frames by those
    * sizes. This is the real pre-decode stage of a video pipeline —
    * demux is pure byte-walking and needs no codec; only frame-payload
    * DECODE stays stubbed in this container. Gated on the `ftyp` box
    * magic; malformed trees → None (quarantine). */
  def demuxMp4(bytes: Array[Byte]): Option[VideoDemux] =
    try {
      if (bytes.length < 12 || bytes(4) != 'f' || bytes(5) != 't' ||
          bytes(6) != 'y' || bytes(7) != 'p') return None
      val containers = Set("moov", "trak", "mdia", "minf", "stbl")
      var mvhd: Option[Array[Byte]] = None
      var stsz: Option[Array[Byte]] = None
      var mdat: Option[Array[Byte]] = None
      def be32(a: Array[Byte], p: Int): Int =
        ((a(p) & 0xff) << 24) | ((a(p + 1) & 0xff) << 16) |
          ((a(p + 2) & 0xff) << 8) | (a(p + 3) & 0xff)
      def walk(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to) {
          val size = be32(bytes, p)
          if (size < 8 || p + size > to) return
          val tpe = new String(bytes, p + 4, 4, "US-ASCII")
          if (containers(tpe)) walk(p + 8, p + size)
          else if (tpe == "mvhd") mvhd = Some(bytes.slice(p + 8, p + size))
          else if (tpe == "stsz") stsz = Some(bytes.slice(p + 8, p + size))
          else if (tpe == "mdat") mdat = Some(bytes.slice(p + 8, p + size))
          p += size
        }
      }
      walk(0, bytes.length)
      for (h <- mvhd; z <- stsz; m <- mdat) yield {
        val timescale = be32(h, 12)
        val duration = be32(h, 16).toLong & 0xffffffffL
        val n = be32(z, 8)
        val sizes = (0 until n).map(i => be32(z, 12 + 4 * i))
        require(sizes.forall(_ >= 0) && sizes.sum <= m.length,
          "stsz inconsistent with mdat")
        VideoDemux(timescale, duration, sizes, m)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB for kinds whose codecs aren't in the container (audio/video):
    * dims/frames as arithmetic on the content hash — deterministic, so
    * the pipeline stays oracle-checkable. */
  def fakeDecode(h: Long): (Int, Int, Int) = {
    val width = 64 + (h % 1024).toInt
    val height = 64 + ((h >> 10) % 1024).toInt
    val nFrames = 1 + ((h >> 20) % 16).toInt
    (width, height, nFrames)
  }

  /** Kind dispatch: images decode for real (still image ⇒ 1 frame);
    * everything else — including image-kind rows whose bytes no reader
    * accepts — takes the stub path. */
  def decode(kind: String, bytes: Array[Byte], h: Long): (Int, Int, Int) =
    (if (kind == "image") decodeImage(bytes) else None) match {
      case Some(info) => (info.width, info.height, 1)
      case None => fakeDecode(h)
    }

  /** Content fingerprint: first 60 bits of MD5 as a non-negative long.
    * MD5 (not a bespoke rolling hash) so the fingerprint is reproducible
    * by any other engine from the same bytes — the property that lets an
    * external system (or the correctness oracle) audit content identity
    * without running this library. */
  def contentHash(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(bytes)
    // first 15 hex chars = 60 bits → always fits a positive Long
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    h >>> 4
  }
}

object Multimodal {

  /** Feature extraction: one decoder pass per partition batch. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE (codec/model load in real life)
      rows.map { r =>
        val ch = MediaDecoder.contentHash(r.bytes)
        val (w, h, frames) = MediaDecoder.decode(r.kind, r.bytes, ch)
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, w, h,
          frames, ch)
      }
    }
  }

  /** Frame sampling: variable-length output per row (iterator-out shape),
    * stride-2 sampling of the fake-decoded frames. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val ch = MediaDecoder.contentHash(r.bytes)
      val (_, _, frames) = MediaDecoder.decode(r.kind, r.bytes, ch)
      (0 until frames by stride).map { i =>
        FrameSample(r.media_id, i, ch ^ i.toLong)
      }
    }
  }

  /** Spread a CPU-heavy synth/decode stage across the cluster: the
    * input is a COLUMN-PRUNED id scan (kilobytes), so Spark's
    * bytes-based partition sizing hands the whole stage to ~one task —
    * measured 23× instead of 10× on the ×10 tier, a single core
    * grinding while 31 idle. Decode stages must be sized by WORK, not
    * input bytes: one narrow round-robin shuffle of the ids (cost:
    * kilobytes) buys full parallelism for the heavy map that follows.
    * At 100 TB the same rule holds wherever the decode INPUT is a
    * pruned manifest/id column rather than the payload itself. */
  private def spreadIds(ids: org.apache.spark.sql.Dataset[Long])
      : org.apache.spark.sql.Dataset[Long] =
    ids.repartition(ids.sparkSession.sparkContext.defaultParallelism)

  /** Real-PNG media table: one deterministic tiny PNG per document id,
    * generated with [[ImageGen]]. The payloads are REAL image bytes —
    * [[MediaDecoder.decodeImage]] must parse actual pixels to recover
    * the dims/channel-sums an oracle derives independently from the
    * generation rule. Encoding runs per-partition (mapPartitions shape,
    * same contract a real fetch-and-decode stage has). */
  def syntheticImages(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spreadIds(graft.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long")).as[Long])
      .mapPartitions(_.map(id =>
        MediaRow(id, "image", "image/png", ImageGen.png(id))))
  }

  /** Real decode over an image table: parse the payload pixels, emit
    * oracle-auditable facts (dims + per-channel sums). Undecodable rows
    * are quarantined (dropped) rather than failing the stage — the
    * oracle's row-count check surfaces any unexpected loss. */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        MediaDecoder.decodeImage(r.bytes).map(i =>
          ImageFeatures(r.media_id, i.width, i.height,
            i.sumR, i.sumG, i.sumB))
      }
    }
  }

  /** Real-WAV media table: one deterministic PCM clip per document id
    * ([[AudioGen]]), decoded back through the JDK codec. */
  def syntheticAudio(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spreadIds(graft.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long")).as[Long])
      .mapPartitions(_.map(id =>
        MediaRow(id, "audio", "audio/wav", AudioGen.wav(id))))
  }

  /** Real decode over an audio table: parse PCM samples, emit
    * oracle-auditable facts (count, rate, channels, exact sample sum). */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        MediaDecoder.decodeAudio(r.bytes).map(a =>
          AudioFeatures(r.media_id, a.nSamples, a.sampleRate,
            a.channels, a.sumSamples))
      }
    }
  }

  /** Real-MP4 media table: one deterministic box tree per document id
    * ([[VideoGen]]). */
  def syntheticVideo(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spreadIds(graft.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long")).as[Long])
      .mapPartitions(_.map(id =>
        MediaRow(id, "video", "video/mp4", VideoGen.mp4(id))))
  }

  /** Real frame extraction: demux the container, slice mdat by the
    * sample-size table, emit one row per frame with its true payload —
    * the variable-length explode a frame-sampling stage feeds to a
    * decoder fleet. Undecodable containers are quarantined (dropped). */
  def videoFrames(media: Dataset[MediaRow]): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        MediaDecoder.demuxMp4(r.bytes).iterator.flatMap { d =>
          var off = 0
          d.frameSizes.zipWithIndex.map { case (len, i) =>
            val f = VideoFrame(r.media_id, i, len,
              d.mdat.slice(off, off + len))
            off += len
            f
          }
        }
      }
    }
  }

  /** Synthesize a media table from `documents` (deterministic payloads:
    * UTF-8 bytes of the text; kind/mime assigned round-robin) — stands in
    * for a real binary-column source so the pipeline is exercised on the
    * driver test data. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mime"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaRow]
  }
}
