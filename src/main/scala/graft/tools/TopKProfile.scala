package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TopK

/** Apples-to-apples timing of the native heap-based top-k operator vs
  * the window row_number formulation of the SAME query:
  * `runMain graft.tools.TopKProfile <sfDir> [reps]`.
  *
  * Spark ≥3.5 plans `row_number() <= k` through WindowGroupLimit — its
  * own two-phase per-group limit — so shuffle VOLUME is equivalent; what
  * distinguishes the native operator is per-partition FULL SORTS on both
  * sides of the exchange (WindowGroupLimit keeps Sort → group-limit →
  * exchange → Sort → window) vs heap selection in O(n log k) with no
  * sort buffer. Two scenarios bracket the shapes: many tiny groups
  * (lineitem per order — sort cost ~ shuffle cost) and few huge groups
  * (events per type — sort cost dominates). Same warm-up + median +
  * noop-protocol as QueryTime; also reports rows/bytes crossing each
  * plan's exchanges. Evidence base for the TopKPerGroup design notes.
  */
object TopKProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOf(mk: () => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val xs = (1 to reps).map(_ => once()).sorted
      xs(xs.size / 2)
    }

    // rows/bytes crossing the exchanges of THIS DataFrame's plan (a
    // write/count executes a separate QueryExecution, so drive toRdd).
    // AQE nests everything in QueryStageExec LEAVES (ResultQueryStage,
    // ShuffleQueryStage) — recurse through each stage's plan.
    def shuffleStats(df: DataFrame): (Long, Long) = {
      df.queryExecution.toRdd.foreach(_ => ())
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      def exchanges(p: SparkPlan): Seq[ShuffleExchangeLike] =
        p.collect {
          case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
          case s: QueryStageExec => exchanges(s.plan)
          case e: ShuffleExchangeLike => Seq(e)
        }.flatten
      val ex = exchanges(df.queryExecution.executedPlan).distinct
      def metric(names: Seq[String]): Long = ex.map { e =>
        names.flatMap(n => e.metrics.get(n).map(_.value)).headOption.getOrElse(0L)
      }.sum
      (metric(Seq("shuffleRecordsWritten", "recordsWritten", "numOutputRows")),
        metric(Seq("dataSize")))
    }

    def report(label: String, native: () => DataFrame,
        window: () => DataFrame): Unit = {
      val tN = timeOf(native)
      val tW = timeOf(window)
      val (nRows, nBytes) = shuffleStats(native())
      val (wRows, wBytes) = shuffleStats(window())
      println(f"$label: native=$tN%.3f s window=$tW%.3f s " +
        f"speedup=${tW / tN}%.2fx | shuffle rows native=$nRows " +
        f"window=$wRows bytes native=$nBytes window=$wBytes reps=$reps")
    }

    // scenario 1: many tiny groups — top-2 lineitems per order (~4/group)
    def li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    report("per_order(many small groups)",
      () => TopK.perGroup(li, 2, Seq("l_orderkey"),
        Seq(TopK.desc("l_extendedprice"), TopK.asc("l_linenumber"))),
      () => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
        li.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 2).drop("rn")
      })

    // scenario 2: few huge groups — top-3 events per type (~n/5 per group)
    def ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
    report("per_type(few huge groups)",
      () => TopK.perGroup(ev, 3, Seq("event_type"),
        Seq(TopK.desc("value"), TopK.asc("event_id"))),
      () => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value").desc, col("event_id"))
        ev.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3).drop("rn")
      })

    spark.stop()
  }
}
