package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-Spark-job wall-clock profiler for one declared query (guide §1:
  * measure first). Runs the query exactly as Bench does (same session
  * shape, same noop sink), with a listener recording every job's
  * duration, call site and task count; prints the breakdown plus the
  * driver-side gap (wall − Σ jobs) so planning/metadata/driver work is
  * attributed too, not just cluster time.
  *
  * Usage: runMain graft.tools.JobProfile <sfDir> <query> [<query> ...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val names = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobprofile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(id: Int, start: Long, var end: Long = -1L,
        var site: String = "", var tasks: Int = 0, var stages: Int = 0)
    val jobs = new scala.collection.concurrent.TrieMap[Int, JobRec]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val r = JobRec(js.jobId, js.time)
        r.site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        r.tasks = js.stageInfos.map(_.numTasks).sum
        r.stages = js.stageInfos.size
        jobs.put(js.jobId, r)
        order.add(js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.get(je.jobId).foreach(_.end = je.time)
    })

    val selected = graft.SparkEntry.inventory.filter(q => names(q.name))
    require(selected.nonEmpty, s"no queries matched: ${names.mkString(",")}")

    selected.foreach { q =>
      // untimed warm lap (plan + codegen + page cache), same as Bench
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async — give the bus a beat to drain
      Thread.sleep(500)
      val recs = order.toArray(Array.empty[Integer])
        .flatMap(i => jobs.get(i))
      val sumJobs = recs.map(r => math.max(0L, r.end - r.start)).sum / 1e3
      println(f"== ${q.name}: wall ${wall}%.2f s, jobs ${recs.length}, " +
        f"sum(job) ${sumJobs}%.2f s, driver gap ${wall - sumJobs}%.2f s")
      recs.foreach { r =>
        val d = math.max(0L, r.end - r.start) / 1e3
        println(f"  job ${r.id}%3d ${d}%7.3f s  stages=${r.stages}%2d " +
          f"tasks=${r.tasks}%4d  ${r.site.take(110)}")
      }
    }
    spark.stop()
  }
}
