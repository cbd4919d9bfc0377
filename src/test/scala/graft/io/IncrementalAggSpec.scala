package graft.io

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("incr_agg").toString

  private def batch(rows: (String, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("event_type", "value")
  }

  private def snapshot(state: String): Map[String, (Long, Long)] =
    IncrementalAgg.read(spark, state, Seq("event_type"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("state after N batches equals the full recompute; no history scan") {
    val state = tmpDir()
    val b1 = batch(("click", 1.10), ("click", 2.20), ("view", 5.00))
    val b2 = batch(("click", 0.70), ("signup", 3.30))
    IncrementalAgg.update(spark, state, b1, Seq("event_type"), "value", "d1")
    IncrementalAgg.update(spark, state, b2, Seq("event_type"), "value", "d2")
    val got = snapshot(state)
    // full recompute over the union, in the same integer cents
    val expected = b1.unionByName(b2)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == expected)
    assert(got("click") == ((3L, 400L)), "1.10+2.20+0.70 = 4.00 = 400 cents")
  }

  test("non-string batch keys keep their type through the first merge") {
    val s = spark
    import s.implicits._
    val state = tmpDir()
    // LONG key: the v0 empty state must take the key type from the
    // batch, not fabricate '' AS k (which would coerce the key to
    // string in the first full_outer merge and freeze it forever)
    val b = Seq((7L, 1.00), (7L, 2.00), (9L, 0.50)).toDF("bucket", "value")
    val out = IncrementalAgg.update(spark, state, b,
      Seq("bucket"), "value", "d1")
    assert(out.schema("bucket").dataType ==
      org.apache.spark.sql.types.LongType,
      "published snapshot key must stay LONG")
    val persisted =
      IncrementalAgg.read(spark, state, Seq("bucket"))
    assert(persisted.schema("bucket").dataType ==
      org.apache.spark.sql.types.LongType)
    val got = persisted.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(7L -> ((2L, 300L)), 9L -> ((1L, 50L))))
  }

  test("replayed batch id is a no-op (exactly-once under retries)") {
    val state = tmpDir()
    val b1 = batch(("click", 1.00))
    IncrementalAgg.update(spark, state, b1, Seq("event_type"), "value", "d1")
    val before = snapshot(state)
    // the at-least-once driver fires the same batch again
    IncrementalAgg.update(spark, state, b1, Seq("event_type"), "value", "d1")
    assert(snapshot(state) == before, "replay must not double-count")
    assert(IncrementalAgg.appliedBatches(spark, state) == Set("d1"))
  }

  test("crash between pointer delete and rename self-heals on next read") {
    val state = tmpDir()
    IncrementalAgg.update(spark, state, batch(("click", 1.00)),
      Seq("event_type"), "value", "d1")
    // simulate the crash window: _CURRENT deleted, _CURRENT.tmp present
    val fs = new Path(state).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val cur = new Path(state, "_CURRENT")
    val tmp = new Path(state, "_CURRENT.tmp")
    val out = fs.create(tmp, true)
    out.write("v1".getBytes("UTF-8")); out.close()
    fs.delete(cur, false)
    // reader completes the rename and still sees version 1
    assert(snapshot(state)("click") == ((1L, 100L)))
    assert(fs.exists(cur) && !fs.exists(tmp), "pointer flip completed")
  }

  test("property: random batch sequences with replays equal the full " +
      "recompute over distinct batches") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val state = tmpDir()
      val types = Seq("click", "view", "purchase", "signup")
      val batches = (1 to 5).map { i =>
        s"b$i" -> batch((1 to rnd.nextInt(20) + 1).map { _ =>
          (types(rnd.nextInt(types.size)),
            (rnd.nextInt(20000) + 1) / 100.0)
        }: _*)
      }
      // apply with injected replays: every other batch fires twice
      batches.zipWithIndex.foreach { case ((id, b), i) =>
        IncrementalAgg.update(spark, state, b, Seq("event_type"), "value", id)
        if (i % 2 == 0)
          IncrementalAgg.update(spark, state, b, Seq("event_type"), "value", id)
      }
      val expected = batches.map(_._2).reduce(_ unionByName _)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
            .as("s"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(snapshot(state) == expected, s"trial $trial diverged")
    }
  }

  test("orphan version dir from a crashed update is overwritten on retry") {
    val state = tmpDir()
    IncrementalAgg.update(spark, state, batch(("click", 1.00)),
      Seq("event_type"), "value", "d1")
    // crashed update: complete v2 dir written but never published
    batch(("garbage", 9.99))
      .write.mode("overwrite").parquet(s"$state/v2/agg")
    val after = IncrementalAgg.update(spark, state, batch(("view", 2.00)),
      Seq("event_type"), "value", "d2")
    assert(snapshot(state) ==
      Map("click" -> ((1L, 100L)), "view" -> ((1L, 200L))),
      "retry rebuilds v2 from the live v1, orphan data is gone")
    assert(after.count() == 2)
  }
}
