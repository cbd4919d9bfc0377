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
    case class StageRec(id: Int, tasks: Int, wallMs: Long, cpuMs: Long,
        runMs: Long, maxTaskMs: Long, shRead: Long, shWrite: Long,
        outRows: Long)
    val jobs = new scala.collection.concurrent.TrieMap[Int, JobRec]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRec]()
    val taskMax = new scala.collection.concurrent.TrieMap[Int, Long]()
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
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = Option(te.taskInfo).map(_.duration).getOrElse(0L)
        taskMax.updateWith(te.stageId)(p =>
          Some(math.max(p.getOrElse(0L), d)))
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(StageRec(si.stageId, si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          if (m == null) 0L else m.executorCpuTime / 1000000L,
          if (m == null) 0L else m.executorRunTime,
          taskMax.getOrElse(si.stageId, 0L),
          if (m == null) 0L else m.shuffleReadMetrics.totalBytesRead,
          if (m == null) 0L else m.shuffleWriteMetrics.bytesWritten,
          if (m == null) 0L else m.outputMetrics.recordsWritten))
      }
    })

    val selected = graft.SparkEntry.inventory.filter(q => names(q.name))
    require(selected.nonEmpty, s"no queries matched: ${names.mkString(",")}")

    selected.foreach { q =>
      // untimed warm lap (plan + codegen + page cache), same as Bench
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      jobs.clear(); order.clear(); stages.clear(); taskMax.clear()
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
      var prevEnd = -1L
      recs.foreach { r =>
        val d = math.max(0L, r.end - r.start) / 1e3
        // driver-side gap since the previous job ended: planning,
        // metadata, FS ops, driver compute — where the "driver gap"
        // total actually lives
        val gap = if (prevEnd < 0) 0.0
          else math.max(0L, r.start - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, r.end)
        println(f"  job ${r.id}%3d ${d}%7.3f s  gap ${gap}%6.3f s  " +
          f"stages=${r.stages}%2d tasks=${r.tasks}%4d  ${r.site.take(95)}")
      }
      // slowest stages with executor CPU vs run time (overhead/IO) and
      // the max single-task duration (straggler detector)
      stages.toArray(Array.empty[StageRec]).sortBy(-_.wallMs).take(12)
        .foreach { s =>
          println(f"  stage ${s.id}%4d wall ${s.wallMs / 1e3}%7.3f s " +
            f"tasks=${s.tasks}%4d cpu ${s.cpuMs / 1e3}%7.2f s " +
            f"run ${s.runMs / 1e3}%7.2f s maxTask ${s.maxTaskMs / 1e3}%6.2f s " +
            f"shR ${s.shRead / 1024}%8d KB shW ${s.shWrite / 1024}%8d KB")
        }
    }
    spark.stop()
  }
}
