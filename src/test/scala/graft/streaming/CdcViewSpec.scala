package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class CdcViewSpec extends SparkSpec {

  private val NB = 8

  private def chg(rows: (Long, String, Double, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "seg", "bal", "op")
  }

  private def state(dir: String): Map[Long, (String, Double)] =
    CdcView.read(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("batch sequence: insert, then update/delete/insert, reads back merged") {
    val dir = tmpDir("cdcview")
    CdcView.applyBatch(chg(
      (1L, "a", 10.0, "I"), (2L, "b", 20.0, "I"), (3L, "c", 30.0, "I")),
      0L, dir, "k", Seq("seg", "bal"), NB)
    assert(state(dir) == Map(
      1L -> ("a", 10.0), 2L -> ("b", 20.0), 3L -> ("c", 30.0)))
    CdcView.applyBatch(chg(
      (1L, "a2", 11.0, "U"), (2L, "b", 20.0, "D"), (9L, "z", 90.0, "I")),
      1L, dir, "k", Seq("seg", "bal"), NB)
    assert(state(dir) == Map(
      1L -> ("a2", 11.0), 3L -> ("c", 30.0), 9L -> ("z", 90.0)))
  }

  test("replayed batch converges to the same state (exactly-once)") {
    val dir = tmpDir("cdcview")
    CdcView.applyBatch(chg((1L, "a", 10.0, "I"), (2L, "b", 20.0, "I")),
      0L, dir, "k", Seq("seg", "bal"), NB)
    val batch1 = chg((1L, "a2", 11.0, "U"), (5L, "e", 50.0, "I"))
    CdcView.applyBatch(batch1, 1L, dir, "k", Seq("seg", "bal"), NB)
    val first = state(dir)
    CdcView.applyBatch(batch1, 1L, dir, "k", Seq("seg", "bal"), NB) // replay
    assert(state(dir) == first)
    assert(first == Map(1L -> ("a2", 11.0), 2L -> ("b", 20.0),
      5L -> ("e", 50.0)))
  }

  test("untouched buckets are not rewritten (maintenance cost follows the batch)") {
    val dir = tmpDir("cdcview")
    // spread keys over several buckets
    CdcView.applyBatch(chg((1 to 40).map(i =>
      (i.toLong, s"s$i", i.toDouble, "I")): _*),
      0L, dir, "k", Seq("seg", "bal"), NB)
    // single-key batch touches exactly one bucket
    CdcView.applyBatch(chg((1L, "upd", 99.0, "U")),
      1L, dir, "k", Seq("seg", "bal"), NB)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val v1Buckets = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.startsWith("bucket="))
      .count(b => fs.exists(new Path(b.getPath, "version=1")))
    assert(v1Buckets == 1, s"expected exactly 1 rewritten bucket, got $v1Buckets")
    assert(state(dir)(1L) == ("upd", 99.0))
    assert(state(dir)(2L) == ("s2", 2.0))
  }

  test("streaming sink end-to-end over MemoryStream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = tmpDir("cdcview")
    val input = MemoryStream[(Long, String, Double, String)]
    val q = CdcView.sink(input.toDF().toDF("k", "seg", "bal", "op"),
      dir, tmpDir("cdcview-ckpt"), "k", Seq("seg", "bal"), NB)
    try {
      input.addData((1L, "a", 10.0, "I"), (2L, "b", 20.0, "I"))
      q.processAllAvailable()
      input.addData((1L, "a2", 11.0, "U"), (2L, "b", 20.0, "D"))
      q.processAllAvailable()
      assert(state(dir) == Map(1L -> ("a2", 11.0)))
    } finally q.stop()
  }
}
