package graft.dq

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Snapshots

/** The DQ run-history audit table ([[DqAudit]]): every attempt is an
  * immutable row, retries supersede only in the latest-per-date view,
  * per-date reads prune to one partition, and the table time-travels
  * through its own audit history.
  */
class DqAuditSpec extends SparkSpec {

  private def report(date: String, nullUsers: Long): DqReport = {
    val c = DqCounters(totalRows = 100L, nullEventId = 0L,
      nullEventType = 0L, nullUserId = nullUsers, invalidEventType = 0L,
      dupExtraRows = 0L)
    DqReport(date, s"raw/$date", s"curated/$date", c,
      failures = DqCheck.all.flatMap(_.evaluate(c)))
  }

  test("8 simultaneous record() calls all land, one version each " +
      "(the reservation is an ATOMIC test-and-set, local fs included)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val t = tmpDir("dq_audit_race")
    val fs = (1 to 8).map { i =>
      Future(DqAudit.record(spark, t, report(f"2025-03-0$i", 0L), s"T$i"))
    }
    fs.foreach(Await.result(_, Duration.Inf))
    assert(Snapshots.currentVersion(spark, t) == 8,
      "every concurrent append must win exactly one version slot")
    assert(DqAudit.history(spark, t).count() == 8,
      "no append may be lost or doubled under the race")
  }

  test("append-only run history; retry supersedes only in the " +
      "latest-per-date view; per-date reads prune; time travel works") {
    val t = tmpDir("dq_audit")
    // day 1 passes; day 2's first attempt trips the null-user gate
    // (10% > 3%), its retry passes
    DqAudit.record(spark, t, report("2025-01-01", 1L), "T01")
    val v2 = DqAudit.record(spark, t, report("2025-01-02", 10L), "T02")
    DqAudit.record(spark, t, report("2025-01-02", 0L), "T03")

    val hist = DqAudit.history(spark, t).collect()
    assert(hist.length == 3, "every attempt is a row, none overwritten")
    assert(hist.map(_.getAs[String]("run_ts")).toSeq ==
      Seq("T01", "T02", "T03"))
    val failed = DqAudit.history(spark, t)
      .where(col("status") === "FAIL").collect()
    assert(failed.length == 1 &&
      failed.head.getSeq[String](
        failed.head.fieldIndex("failures")).nonEmpty,
      "the tripped gate's failure message must be queryable")

    val latest = DqAudit.latestPerDate(spark, t)
      .collect().map(r => r.getAs[String]("ingestion_date") ->
        ((r.getAs[String]("run_ts"), r.getAs[String]("status")))).toMap
    assert(latest == Map(
      "2025-01-01" -> (("T01", "PASS")),
      "2025-01-02" -> (("T03", "PASS"))),
      s"latest view must show the retry, not the failure: $latest")

    // per-date audit read prunes to the date's partition files
    val cur = Snapshots.currentVersion(spark, t)
    val m = Snapshots.readManifest(spark, t, cur)
    val d2 = m.filter(_.partition == "2025-01-02").map(_.path)
    assert(d2.size == 2 && d2.size < m.size,
      "date partitions must subdivide the audit table")

    // time travel through the audit's own history: before the retry,
    // day 2's latest attempt WAS the failure
    val asOf = Snapshots.readAsOf(spark, t, v2)
      .where(col("ingestion_date") === "2025-01-02")
      .select(col("status")).collect().map(_.getString(0)).toSeq
    assert(asOf == Seq("FAIL"),
      "pre-retry versions must still show the failed attempt only")
  }
}
