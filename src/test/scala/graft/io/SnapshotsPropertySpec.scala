package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property: ANY sequence of full/overwrite/append/compact commits
  * leaves `read()` equal to a driver-side model fold, and every
  * intermediate `readAsOf(k)` equal to the model's state after k
  * commits — i.e. versions are immutable historical facts no later
  * operation can disturb. Seeded-random sequences stand in for forAll
  * (the IncrementalAggSpec pattern). */
class SnapshotsPropertySpec extends SparkSpec {

  private val parts = Seq("p0", "p1", "p2")

  test("random commit sequences: read() ≡ model fold and every " +
      "readAsOf(k) ≡ the model's k-prefix") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)

    (1 to 3).foreach { trial =>
      val t = tmpDir(s"snap_prop$trial")
      var nextId = 0
      def batch(p: String, n: Int): Seq[(String, String, Long)] =
        (1 to n).map { _ =>
          nextId += 1
          (s"r$nextId", p, rnd.nextInt(1000).toLong)
        }

      // model: partition -> rows currently live
      var model = Map.empty[String, Seq[(String, String, Long)]]
      val history = scala.collection.mutable.ArrayBuffer(model)

      // v1 must be a full commit
      val init = parts.flatMap(p => batch(p, 1 + rnd.nextInt(3)))
      Snapshots.commitFull(init.toDF("id", "day", "cents"), t, "day")
      model = init.groupBy(_._2)
      history += model

      (1 to 8).foreach { _ =>
        val p = parts(rnd.nextInt(parts.size))
        rnd.nextInt(3) match {
          case 0 => // overwrite one partition
            val b = batch(p, 1 + rnd.nextInt(3))
            Snapshots.commitOverwritePartition(
              b.toDF("id", "day", "cents"), t, "day", p)
            model = model.updated(p, b)
          case 1 => // append a batch to one partition
            val b = batch(p, 1 + rnd.nextInt(3))
            Snapshots.commitAppend(b.toDF("id", "day", "cents"), t, "day")
            model = model.updated(p, model.getOrElse(p, Nil) ++ b)
          case 2 => // compact (content-neutral commit)
            Snapshots.commitCompact(spark, t, "day", p)
        }
        history += model
      }

      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.select("id", "day", "cents").collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

      assert(rowsOf(Snapshots.read(spark, t)) ==
        model.values.flatten.toSet, s"trial $trial: final state")
      // every historical version must still answer with its own state
      (1 until history.size).foreach { k =>
        assert(rowsOf(Snapshots.readAsOf(spark, t, k)) ==
          history(k).values.flatten.toSet,
          s"trial $trial: version $k drifted")
      }
    }
  }

  test("a reader hammering read() during live commits only ever " +
      "observes complete published states") {
    val s = spark
    import s.implicits._
    val t = tmpDir("snap_race")
    // state k = rows r1..r_k in one partition: every VALID observation
    // is a prefix set, and a torn read (mixed manifests / partial data)
    // could not be one
    def rowsUpTo(k: Int) = (1 to k).map(i => (s"r$i", "d1", i.toLong))
    Snapshots.commitFull(rowsUpTo(1).toDF("id", "day", "cents"), t, "day")

    val observed =
      new java.util.concurrent.ConcurrentLinkedQueue[Set[String]]()
    @volatile var writerDone = false
    val reader = new Thread(() => {
      while (!writerDone) {
        observed.add(
          Snapshots.read(spark, t).select("id").collect()
            .map(_.getString(0)).toSet)
      }
    })
    reader.start()
    try {
      (2 to 12).foreach { k =>
        Snapshots.commitOverwritePartition(
          rowsUpTo(k).toDF("id", "day", "cents"), t, "day", "d1")
      }
    } finally { writerDone = true; reader.join(30000) }

    val valid = (1 to 12).map(k => (1 to k).map(i => s"r$i").toSet).toSet
    val seen = scala.jdk.CollectionConverters
      .CollectionHasAsScala(observed).asScala.toSet
    assert(seen.nonEmpty, "the reader must have completed some reads")
    val torn = seen -- valid
    assert(torn.isEmpty, s"torn states observed: ${torn.take(3)}")
  }
}
