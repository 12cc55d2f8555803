package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Job/stage-level timing split for one query (optimization-round
  * diagnostic, guide §1: measure first). Runs warmup + one timed pass
  * through the bench's own noop materialization and prints every Spark
  * job with its wall time and call site, plus per-stage task-time
  * totals — the local-mode substitute for the Spark UI's job list.
  *
  *   sbt "runMain graft.tools.JobProfile <query> [sfDir]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q1_pricing").split(",").toSeq
    val dir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.create()
    names.foreach { name => profile(spark, name, dir) }
    spark.stop()
  }

  private def profile(spark: org.apache.spark.sql.SparkSession,
                      name: String, dir: String): Unit = {
    val fn = SparkEntry.queries(name)

    final case class Job(id: Int, start: Long, var end: Long = -1L,
                         site: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val stageTask = mutable.LinkedHashMap.empty[Int, (String, Long, Int)]
    var enabled = false
    // captured so profiling a comma-separated list can REMOVE each
    // query's listener after its pass (ADVICE r21: N stale listeners
    // otherwise accumulate on the bus)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (enabled) jobs.synchronized {
          val site = Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
          jobs(js.jobId) = Job(js.jobId, js.time, site = site)
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (enabled) jobs.synchronized {
          jobs.get(je.jobId).foreach(_.end = je.time)
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (enabled) stageTask.synchronized {
          val info = sc.stageInfo
          stageTask(info.stageId) = (info.name.takeWhile(_ != '\n'),
            info.taskMetrics.executorRunTime, info.numTasks)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def pass(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    spark.catalog.clearCache()
    System.gc()
    val w = pass() // warmup, untimed listener
    enabled = true
    val sec = pass()
    enabled = false
    // listener bus is async; let the last events drain
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)

    println(f"== $name: warmup $w%.2f s, timed $sec%.2f s, " +
      f"jobs=${jobs.size} ==")
    var prevEnd = -1L
    jobs.values.toSeq.sortBy(_.start).foreach { j =>
      val dur = (j.end - j.start) / 1e3
      val gap = if (prevEnd < 0) 0.0 else (j.start - prevEnd) / 1e3
      prevEnd = math.max(prevEnd, j.end)
      println(f"job ${j.id}%4d  ${dur}%8.3f s  gap ${gap}%6.3f s  ${j.site}")
    }
    println("-- stages by executor task time --")
    stageTask.toSeq.sortBy(-_._2._2).take(12).foreach {
      case (sid, (nm, ms, nt)) =>
        println(f"stage $sid%4d  ${ms / 1e3}%8.3f s task-time  tasks=$nt%3d  $nm")
    }
  }
}
