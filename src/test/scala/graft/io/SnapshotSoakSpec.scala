package graft.io

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong, AtomicReference}

import org.apache.spark.sql.functions._

import graft.{Slow, SparkSpec}

/** Concurrency SOAK of the snapshot store (verdict r11 task #8): OCC
  * slot reservation, the atomic pointer REPLACE, tag publish/heal, and
  * vacuum's retention floor are each spec'd in isolation — this runs
  * them against ONE table simultaneously for the whole interleaving
  * space: N writers × M readers × a tagger × a vacuum loop, thousands
  * of operations total, asserting the invariants that define the
  * store:
  *
  *   - NO LOST UPDATE: the final content of every partition is exactly
  *     the payload of the HIGHEST-version commit that touched it (the
  *     reservation serializes writers; version order is the history);
  *   - NO TORN READ: every read observes, per partition, exactly one
  *     commit's payload — never a mix (manifest pinning + pointer
  *     atomicity);
  *   - NO READER CRASH: current-version reads never throw while
  *     vacuums reclaim history underneath them (retention lag 3 ≫ the
  *     read window) and writers land files beside them — including the
  *     in-flight-commit window where a racing vacuum must SPARE the
  *     reserved slot's freshly-written, not-yet-referenced files;
  *   - FLOORS NEVER REGRESS: the retention floor is monotone across
  *     concurrent vacuums/commits/tag retargets;
  *   - TAG SANITY: concurrent tag retargets + reader heals always
  *     leave the ref readable at SOME version a publisher wrote.
  *
  * Interleavings this soak actually caught during development: the
  * vacuum × in-flight-commit file reclaim (fixed in Snapshots.vacuum —
  * commit dirs above the vacuum's pinned current version are spared)
  * and the tag-publish heal race (fixed in Snapshots.tag — idempotent
  * re-read accept). See DESIGN_NOTES round-12.
  */
class SnapshotSoakSpec extends SparkSpec {

  private val Parts = Vector("p0", "p1", "p2", "p3")

  private def payload(part: String, stamp: Long) = {
    val s = spark
    import s.implicits._
    (1 to 5).map(k => (s"$part-$k", part, stamp))
      .toDF("id", "day", "stamp")
  }

  test("soak: writers x readers x tagger x vacuum — no lost update, " +
      "no torn read, no reader crash, floors monotone", Slow) {
    val t = tmpDir("snap_soak")
    Snapshots.commitFull(
      Parts.map(p => payload(p, 0L)).reduce(_ unionByName _), t, "day")

    val failure = new AtomicReference[Throwable](null)
    val writersDone = new AtomicBoolean(false)
    val ops = new AtomicLong(0L)
    // version -> (partition, stamp) for every SUCCESSFUL commit
    val commits = new ConcurrentHashMap[Int, (String, Long)]()
    def guard(body: => Unit): Unit =
      try body catch { case e: Throwable => failure.compareAndSet(null, e) }

    val nWriters = 3
    val commitsPerWriter = 18
    val writers = (0 until nWriters).map { w =>
      new Thread(() => guard {
        for (i <- 1 to commitsPerWriter) {
          val part = Parts((w * 7 + i) % Parts.size)
          val stamp = (w + 1) * 1000000L + i
          var done = false
          while (!done && failure.get() == null) {
            try {
              val v = Snapshots.commitOverwritePartition(
                payload(part, stamp), t, "day", part)
              commits.put(v, (part, stamp))
              ops.incrementAndGet()
              done = true
            } catch {
              case _: Snapshots.ConcurrentCommitException =>
                Thread.sleep(5 + w * 3) // lost the slot race; retry
            }
          }
        }
      }, s"soak-writer-$w")
    }

    val readers = (0 until 2).map { r =>
      new Thread(() => guard {
        while (!writersDone.get() && failure.get() == null) {
          // pin the CURRENT version and check atomicity: one stamp per
          // partition, never a mix of two commits' rows
          val perPart = Snapshots.read(spark, t)
            .groupBy(col("day"))
            .agg(countDistinct(col("stamp")).as("n"))
            .collect()
          perPart.foreach { row =>
            assert(row.getLong(1) == 1L,
              s"torn read: partition ${row.getString(0)} shows " +
                s"${row.getLong(1)} stamps")
          }
          // double as the HEALER role in the tag-publish race: this
          // read's crash-window heal is what the tagger's idempotent
          // accept must survive
          try Snapshots.versionOfRef(spark, t, "soak")
          catch { case _: IllegalArgumentException => () } // not yet tagged
          ops.incrementAndGet()
        }
      }, s"soak-reader-$r")
    }

    val tagger = new Thread(() => guard {
      while (!writersDone.get() && failure.get() == null) {
        val v = Snapshots.currentVersion(spark, t)
        try {
          Snapshots.tag(spark, t, "soak", v, replace = true)
          val got = Snapshots.versionOfRef(spark, t, "soak")
          assert(got >= 1 && got <= Snapshots.currentVersion(spark, t))
        } catch {
          // a stale currentVersion read can fall below a concurrent
          // vacuum's floor — a legitimate refusal, not a defect
          case e: IllegalArgumentException
              if e.getMessage.contains("retention floor") => ()
        }
        ops.incrementAndGet()
      }
    }, "soak-tagger")

    val floorLog = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val vacuumer = new Thread(() => guard {
      while (!writersDone.get() && failure.get() == null) {
        Thread.sleep(400)
        val cur = Snapshots.currentVersion(spark, t)
        if (cur > 5) {
          Snapshots.vacuum(spark, t, cur - 3)
          val fl = Snapshots.retentionFloor(spark, t)
          if (!floorLog.isEmpty)
            assert(fl >= floorLog.get(floorLog.size - 1),
              s"retention floor regressed: ${floorLog.get(floorLog.size - 1)} -> $fl")
          floorLog.add(fl)
          ops.incrementAndGet()
        }
      }
    }, "soak-vacuum")

    val aux = readers :+ tagger :+ vacuumer
    (writers ++ aux).foreach(_.start())
    writers.foreach(_.join(600000))
    writersDone.set(true)
    aux.foreach(_.join(600000))
    if (failure.get() != null) throw failure.get()

    // serializability: the store's final state replays the version
    // order — each partition holds exactly its last committer's payload
    val total = nWriters * commitsPerWriter
    assert(commits.size == total, s"lost commit: ${commits.size}/$total")
    assert(Snapshots.currentVersion(spark, t) == 1 + total)
    import scala.jdk.CollectionConverters._
    val lastPer = commits.asScala.toSeq
      .groupBy(_._2._1)
      .map { case (p, vs) => p -> vs.maxBy(_._1)._2._2 }
    val finalState = Snapshots.read(spark, t)
      .groupBy(col("day"))
      .agg(countDistinct(col("stamp")).as("n"), max(col("stamp")).as("s"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    Parts.foreach { p =>
      val (nStamps, stamp) = finalState(p)
      assert(nStamps == 1L, s"$p holds a mix of commits")
      assert(lastPer.get(p).forall(_ == stamp),
        s"lost update on $p: expected ${lastPer.get(p)}, found $stamp")
    }
    assert(!floorLog.isEmpty, "the vacuum loop never ran")
    assert(Snapshots.versionOfRef(spark, t, "soak") >= 1)
    info(s"soak ops=${ops.get()} commits=$total vacuums=${floorLog.size} " +
      s"finalFloor=${floorLog.get(floorLog.size - 1)}")
    assert(ops.get() >= 1000,
      s"soak too small to mean anything: ${ops.get()} ops")
  }

  test("mixed-writer soak: overwrite x append x MERGE x schema " +
      "evolution against one table — OCC serializes, nothing is lost",
      Slow) {
    val s = spark
    import s.implicits._
    val t = tmpDir("snap_soak_mixed")
    Snapshots.commitFull(payload("p0", 0L), t, "day")

    val failure = new AtomicReference[Throwable](null)
    def guard(body: => Unit): Unit =
      try body catch { case e: Throwable => failure.compareAndSet(null, e) }

    // overwriter: last-stamp-wins on partition p0 (the slot-race writer)
    val nOver = 12
    val overwriter = new Thread(() => guard {
      for (i <- 1 to nOver) {
        var done = false
        while (!done && failure.get() == null) {
          try {
            Snapshots.commitOverwritePartition(
              payload("p0", 100L + i), t, "day", "p0")
            done = true
          } catch {
            case _: Snapshots.ConcurrentCommitException => Thread.sleep(7)
          }
        }
      }
    }, "mixed-overwriter")

    // appender: append-only arrivals, one fresh id per append; from
    // iteration 6 the frame carries a NEW column — add-only schema
    // evolution races the other writers' commits
    val nApp = 12
    val appender = new Thread(() => guard {
      for (i <- 1 to nApp) {
        val base = Seq((s"a-$i", "pa", i.toLong)).toDF("id", "day", "stamp")
        val frame =
          if (i <= 5) base
          else base.withColumn("extra", lit(s"x$i"))
        var done = false
        while (!done && failure.get() == null) {
          try {
            Snapshots.commitAppend(frame, t, "day")
            done = true
          } catch {
            case _: Snapshots.ConcurrentCommitException => Thread.sleep(9)
          }
        }
      }
    }, "mixed-appender")

    // merger: keyed CDC onto its own partition pm — upserts cycling 3
    // keys, a delete every 4th op; OCC (expectedPrev) forces a retry
    // whenever any other writer publishes mid-merge. The expected final
    // state replays the op sequence in order (single merger thread, so
    // ITS ops are totally ordered regardless of interleaving).
    val nMerge = 10
    val expected = scala.collection.mutable.Map[String, Long]()
    val merger = new Thread(() => guard {
      for (i <- 1 to nMerge) {
        val k = s"m-k${i % 3}"
        val del = i % 4 == 0
        val batch = Seq((k, "pm", i.toLong, if (del) "D" else "U"))
          .toDF("id", "day", "stamp", "op")
        var done = false
        while (!done && failure.get() == null) {
          try {
            Snapshots.mergeRows(s, t, "day", "id", batch)
            done = true
          } catch {
            case _: Snapshots.ConcurrentCommitException => Thread.sleep(11)
          }
        }
        if (del) expected.remove(k) else expected(k) = i.toLong
      }
    }, "mixed-merger")

    val done = new AtomicBoolean(false)
    val reader = new Thread(() => guard {
      while (!done.get() && failure.get() == null) {
        val byDay = Snapshots.read(spark, t)
          .groupBy(col("day")).agg(countDistinct(col("stamp")).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        byDay.get("p0").foreach(n =>
          assert(n == 1L, s"torn read on p0: $n stamps"))
      }
    }, "mixed-reader")

    val threads = Seq(overwriter, appender, merger)
    reader.start()
    threads.foreach(_.start())
    threads.foreach(_.join(600000))
    done.set(true)
    reader.join(600000)
    if (failure.get() != null) throw failure.get()

    val fin = Snapshots.read(spark, t)
    // overwriter: exactly the last stamp on p0
    val p0 = fin.where(col("day") === "p0")
      .select(col("stamp")).distinct().as[Long].collect().toSeq
    assert(p0 == Seq(100L + nOver), s"lost overwrite: $p0")
    // appender: every append present exactly once, none lost to the
    // slot races it retried through
    val appIds = fin.where(col("day") === "pa")
      .select(col("id")).as[String].collect().sorted.toSeq
    assert(appIds == (1 to nApp).map(i => s"a-$i").sorted,
      s"append set wrong: $appIds")
    // schema evolution landed and old rows null-fill the new column
    assert(fin.columns.contains("extra"))
    assert(fin.where(col("id") === "a-3" && col("extra").isNull)
      .count() == 1)
    assert(fin.where(col("id") === s"a-$nApp" &&
      col("extra") === s"x$nApp").count() == 1)
    // merger: final pm content = the op sequence replayed in order
    val got = fin.where(col("day") === "pm")
      .select(col("id"), col("stamp")).as[(String, Long)]
      .collect().toMap
    assert(got == expected.toMap,
      s"merge replay mismatch: got $got expected $expected")
    // version math: one version per successful commit, none skipped
    assert(Snapshots.currentVersion(spark, t) ==
      1 + nOver + nApp + nMerge)
  }
}
