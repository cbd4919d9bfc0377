package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query timing harness: `runMain graft.tools.QueryTime <name>
  * <sfDir> [reps]` — same session shape and noop-sink protocol as
  * graft.Bench, but for one query, so operator-level changes can be
  * measured without a full inventory run (single-query numbers from ad
  * hoc shells are noisy when other JVMs run; this at least fixes the
  * protocol: warm-up + median of reps).
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm-up
    val times = (1 to reps).map(_ => once()).sorted
    println(f"$name median=${times(times.size / 2)}%.3f s " +
      f"min=${times.head}%.3f max=${times.last}%.3f reps=$reps")
    spark.stop()
  }
}
