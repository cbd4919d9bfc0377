package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def media(rows: (Long, String, String, String)*) = {
    val s = spark
    import s.implicits._
    s.createDataset(rows.map { case (id, kind, mime, payload) =>
      MediaRow(id, kind, mime, payload.getBytes("UTF-8"))
    })
  }

  test("extractFeatures: deterministic stub decode, byte-accurate metadata") {
    val ds = media(
      (1L, "image", "image/png", "payload-one"),
      (2L, "video", "video/mp4", "a longer payload with more bytes"))
    val feats = Multimodal.extractFeatures(ds).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).n_bytes == 11L)
    assert(feats(2L).n_bytes == 32L)
    // deterministic: same payload → same fake dims + hash
    val again = Multimodal.extractFeatures(ds).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L) == again(1L))
    assert(feats(1L).width >= 64 && feats(1L).height >= 64)
    assert(feats(1L).n_frames >= 1)
    assert(feats(1L).content_hash != feats(2L).content_hash)
  }

  test("sampleFrames: stride sampling of variable-length frame output") {
    val ds = media((1L, "video", "video/mp4", "frames payload"))
    val nFrames = Multimodal.extractFeatures(ds).head().n_frames
    val samples = Multimodal.sampleFrames(ds, stride = 2).collect()
    assert(samples.map(_.frame_idx).toSeq ==
      (0 until nFrames by 2).toSeq)
    assert(samples.forall(_.media_id == 1L))
  }

  test("golden: ImageGen PNG round-trips through a REAL ImageIO decode") {
    val id = 42L
    val bytes = ImageGen.png(id)
    // real PNG magic, decodable by any standards-compliant reader
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte)
    val info = MediaDecoder.decodeImage(bytes)
      .getOrElse(fail("generated PNG must decode"))
    val (w, h) = ImageGen.dims(id)
    assert((info.width, info.height) == (w, h))
    // channel sums recomputed directly from the generation rule
    val expected = (for { y <- 0 until h; x <- 0 until w }
      yield ImageGen.rgb(id, x, y))
      .foldLeft((0L, 0L, 0L)) { case ((r, g, b), (pr, pg, pb)) =>
        (r + pr, g + pg, b + pb) }
    assert((info.sumR, info.sumG, info.sumB) == expected,
      "decode must recover exact pixel values (PNG is lossless)")
  }

  test("decodeImage quarantines non-image bytes (magic gate, no throw)") {
    assert(MediaDecoder.decodeImage("plain text".getBytes("UTF-8")).isEmpty)
    // "BM" prefix would reach ImageIO's BMP probe without the gate —
    // with a garbage header that is an allocation bomb, not a decode
    assert(MediaDecoder.decodeImage(
      "BM garbage that is not a bitmap".getBytes("UTF-8")).isEmpty)
    // truncated PNG: passes the magic gate, parser fails → still None
    assert(MediaDecoder.decodeImage(ImageGen.png(7L).take(20)).isEmpty)
  }

  test("extractFeatures dispatches image-kind rows to the real decoder") {
    val s = spark
    import s.implicits._
    val id = 11L
    val ds = s.createDataset(Seq(
      MediaRow(id, "image", "image/png", ImageGen.png(id)),
      MediaRow(12L, "audio", "audio/wav", "not pixels".getBytes("UTF-8"))))
    val feats = Multimodal.extractFeatures(ds).collect()
      .map(f => f.media_id -> f).toMap
    val (w, h) = ImageGen.dims(id)
    assert((feats(id).width, feats(id).height, feats(id).n_frames)
      == (w, h, 1), "real decode: dims from pixels, still image = 1 frame")
    assert(feats(12L).width >= 64, "audio stays on the stub path")
  }

  test("syntheticImages + imageFeatures: distributed real decode at sf0.001") {
    val ds = Multimodal.syntheticImages(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.imageFeatures(ds.repartition(4))
    assert(feats.count() == 500, "every generated PNG must decode")
    val f0 = feats.filter(_.media_id == 0L).head()
    assert((f0.width, f0.height) == ImageGen.dims(0L))
  }

  test("golden: AudioGen WAV round-trips through a REAL javax.sound decode") {
    val id = 123L
    val bytes = AudioGen.wav(id)
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    val info = MediaDecoder.decodeAudio(bytes)
      .getOrElse(fail("generated WAV must decode"))
    assert(info.nSamples == AudioGen.nSamples(id).toLong)
    assert(info.sampleRate == AudioGen.SampleRate && info.channels == 1)
    val expected = (0 until AudioGen.nSamples(id))
      .map(i => AudioGen.sample(id, i).toLong).sum
    assert(info.sumSamples == expected,
      "decode must recover exact PCM values")
  }

  test("decodeAudio quarantines non-WAV bytes") {
    assert(MediaDecoder.decodeAudio("not audio".getBytes("UTF-8")).isEmpty)
    // RIFF magic but truncated/garbage body → parser fails → None
    assert(MediaDecoder.decodeAudio(AudioGen.wav(5L).take(30)).isEmpty)
    // an image is not audio
    assert(MediaDecoder.decodeAudio(ImageGen.png(5L)).isEmpty)
  }

  test("syntheticAudio + audioFeatures: distributed real decode at sf0.001") {
    val feats = Multimodal.audioFeatures(
      Multimodal.syntheticAudio(spark, "/root/testdata/sf0.001")
        .repartition(4))
    assert(feats.count() == 500, "every generated WAV must decode")
    val f = feats.filter(_.media_id == 7L).head()
    assert(f.n_samples == AudioGen.nSamples(7L).toLong)
  }

  test("golden: VideoGen MP4 demuxes to exact mvhd/stsz/mdat facts") {
    val id = 42L
    val bytes = VideoGen.mp4(id)
    assert(new String(bytes.slice(4, 8), "US-ASCII") == "ftyp")
    val v = MediaDecoder.demuxMp4(bytes)
      .getOrElse(fail("generated MP4 must demux"))
    assert(v.timescale == VideoGen.Timescale)
    assert(v.duration == VideoGen.duration(id))
    val n = VideoGen.nFrames(id)
    assert(v.frameSizes == (0 until n).map(VideoGen.frameLen(id, _)))
    assert(v.mdat.length == v.frameSizes.sum)
    // frame slicing recovers the exact generated payload bytes
    val first = v.mdat.slice(0, v.frameSizes.head)
    assert(first.zipWithIndex.forall { case (b, j) =>
      (b & 0xff) == VideoGen.frameByte(id, 0, j) })
  }

  test("demuxMp4 quarantines non-MP4 and malformed trees") {
    assert(MediaDecoder.demuxMp4("not a video".getBytes("UTF-8")).isEmpty)
    assert(MediaDecoder.demuxMp4(AudioGen.wav(3L)).isEmpty)
    // valid magic, truncated mid-box → walk stops, boxes missing → None
    assert(MediaDecoder.demuxMp4(VideoGen.mp4(3L).take(40)).isEmpty)
  }

  test("videoFrames: distributed demux + slice at sf0.001") {
    val frames = Multimodal.videoFrames(
      Multimodal.syntheticVideo(spark, "/root/testdata/sf0.001")
        .repartition(4))
    val perDoc = frames.collect().groupBy(_.media_id)
    assert(perDoc.size == 500)
    perDoc.foreach { case (id, fs) =>
      assert(fs.length == VideoGen.nFrames(id))
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length))
    }
  }

  test("syntheticMedia: schema carries binary payload + kind/mime metadata") {
    val ds = Multimodal.syntheticMedia(spark, "/root/testdata/sf0.001")
    val schema = ds.schema
    assert(schema("bytes").dataType.typeName == "binary")
    val rows = ds.limit(6).collect()
    assert(rows.forall(r => Set("image", "audio", "video").contains(r.kind)))
    assert(rows.forall(r => r.bytes.nonEmpty))
    // partition-parallel decode: runs across partitions without collect
    val n = Multimodal.extractFeatures(ds.repartition(4)).count()
    assert(n == 500)
  }
}
