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
