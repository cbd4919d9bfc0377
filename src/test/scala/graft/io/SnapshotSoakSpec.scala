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
}
