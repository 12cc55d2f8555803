package graft

/** Diagnostic main: time one `SparkEntry.queries` entry with the same
  * harness rules as Bench (noop materialization, discarded warmup),
  * printing every pass so run-to-run variance is visible.
  *
  *   sbt "runMain graft.Time <queryName> [sfDir] [passes]"
  */
object Time {
  /** Opt-in (SPARK_GRAFT_TIME_DEBUG=1) job/stage tracer for chasing
    * slow passes: prints each job's wall time and, per stage, the task
    * count, total task time, and max single-task time. A pass whose
    * wall time dwarfs its jobs' summed task time is stalling OFF the
    * executors (driver/scheduler/broadcast); a stage whose max task
    * ~= job wall time is a straggler. */
  private final class JobTracer extends org.apache.spark.scheduler.SparkListener {
    private val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    private val stageStats = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long)]()
    override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobStart.put(j.jobId, System.nanoTime())
    override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val ms = if (t.taskInfo == null) 0L else t.taskInfo.duration
      stageStats.merge(t.stageId, (1, ms, ms), (a, b) =>
        (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3)))
      val m = t.taskMetrics
      if (m != null && ms > 1000)
        println(f"[trace]     slow task stage ${t.stageId}: wall ${ms / 1000.0}%.2f s, cpu ${m.executorCpuTime / 1e9}%.2f s, deser ${m.executorDeserializeTime / 1000.0}%.2f s, gc ${m.jvmGCTime / 1000.0}%.2f s, spillMem ${m.memoryBytesSpilled}, shufWait ${m.shuffleReadMetrics.fetchWaitTime / 1000.0}%.2f s")
    }
    override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val st = s.stageInfo
      val (n, tot, mx) = stageStats.getOrDefault(st.stageId, (0, 0L, 0L))
      if (tot > 500 || mx > 200)
        println(f"[trace]   stage ${st.stageId} '${st.name.takeWhile(_ != '\n').take(60)}': $n tasks, sum ${tot / 1000.0}%.2f s, max task ${mx / 1000.0}%.2f s")
    }
    override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      val t0 = jobStart.getOrDefault(j.jobId, 0L)
      val s = if (t0 == 0) -1.0 else (System.nanoTime() - t0) / 1e9
      if (s > 0.5) println(f"[trace] job ${j.jobId}: $s%.2f s wall")
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.create()
    if (sys.env.get("SPARK_GRAFT_TIME_DEBUG").contains("1"))
      spark.sparkContext.addSparkListener(new JobTracer)
    val fn = SparkEntry.queries(name)
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warmup
    val times = (1 to passes).map { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name pass $i: $s%.3f s")
      s
    }
    println(f"[time] $name median: ${times.sorted.apply(passes / 2)}%.3f s @ $dir")
    spark.stop()
  }
}
