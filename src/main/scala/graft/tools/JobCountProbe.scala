package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger

/** Dev probe: runs named suite queries with a job/stage-count listener,
  * attributing wall time to scheduler round-trips. The suite has a
  * measured ~0.25 s per-job floor on this host (FloorProbe, SCALE.md
  * r6) — a query whose wall time ≈ jobs × floor is SCHEDULER-bound, and
  * the only lever left is cutting actions per round, not shuffle work.
  * Used for the r8 graph_components floor attribution.
  *
  * Usage: runMain graft.tools.JobCountProbe <sfDir> <query> [query ...]
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("graph_components")
    val spark = graft.GraftSession.builder("graft-jobcount-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), dir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    // GRAFT_PROBE_JOBS=1: per-job duration + call-site lines (r12) — the
    // attribution view for job-floor-bound families (lake_*)
    val perJob = sys.env.get("GRAFT_PROBE_JOBS").contains("1")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (perJob) jobStart.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short")))
            .getOrElse("?")))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        if (perJob) Option(jobStart.get(j.jobId)).foreach { case (t0, desc) =>
          println(f"[jobtrace]   job=${j.jobId}%-4d ${(System.nanoTime() - t0) / 1e9}%6.2f s  $desc")
        }
    }
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT/daemon warm
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      // rep 1 warms the family cache so rep 2 attributes the query alone
      for (rep <- 1 to 2) {
        jobs.set(0); stages.set(0)
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        // listener events post asynchronously — drain the bus before
        // reading the counters or the last job's tail events are lost
        org.apache.spark.GraftSparkShims.drainListenerBus(spark.sparkContext)
        spark.sparkContext.removeSparkListener(listener)
        println(f"[jobcount] $name%-28s rep=$rep rows=$n%-8d jobs=${jobs.get}%-4d stages=${stages.get}%-4d ${secs}%.2f s (${secs / math.max(jobs.get, 1)}%.3f s/job)")
      }
    }
    spark.stop()
  }
}
