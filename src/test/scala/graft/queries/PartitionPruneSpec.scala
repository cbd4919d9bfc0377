package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the partition-pruned bench path (verdict r6 #5): the
  * `ref_pruned_day_hourly` query must scan its date-partitioned layout
  * with a real partition predicate — non-empty PartitionFilters on
  * event_date, i.e. file listing O(partition) not O(table) — and agree
  * exactly with the same aggregation over the flat events file.
  */
class PartitionPruneSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("ref_pruned_day_hourly scans with non-empty PartitionFilters " +
      "on event_date") {
    val q = RefQueries.all.find(_.name == "ref_pruned_day_hourly").get
    val df = q.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val pf = plan.linesIterator
      .find(_.contains("PartitionFilters: ["))
      .getOrElse(fail(s"no PartitionFilters in plan:\n$plan"))
    assert(pf.contains("event_date"), pf)
    assert(!pf.replaceAll("\\s", "").contains("PartitionFilters:[]"),
      s"partition filters are EMPTY — the scan lists every directory: $pf")

    val ev = graft.Tables.events(spark, sfDir)
    val minDay = ev.agg(min(to_date(col("ts")))).head.getDate(0)
    val expected = ev.where(to_date(col("ts")) === lit(minDay))
      .groupBy(hour(col("ts")).cast("int").as("hr"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("hr")).collect().map(_.toSeq).toSeq
    assert(df.collect().map(_.toSeq).toSeq == expected)
    assert(expected.nonEmpty, "fixture must have at least one day of events")
  }
}
