package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev probe: runs named suite queries with a stage-metrics listener and
  * prints per-stage shuffle/spill attribution — the instrument behind the
  * r10 "partitions ∝ data" A/B on the shingle-verify family. A stage
  * whose spill grows superlinearly while its shuffle-read stays linear is
  * partition-starved (per-partition working set outgrew execution
  * memory); the fix is partition count scaling with data, not a plan
  * change. A stage with zero spill and growing wall is compute-bound.
  *
  * Usage: runMain graft.tools.SpillProbe <sfDir> <query> [query ...]
  * Conf A/B via SPARK_GRAFT_EXTRA_CONF (e.g. spark.sql.shuffle.partitions).
  */
object SpillProbe {
  private case class StageRow(id: Int, name: String, tasks: Int,
                              shuffleReadMB: Long, shuffleWriteMB: Long,
                              memSpillMB: Long, diskSpillMB: Long,
                              peakExecMB: Long, cpuSec: Double)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("dedup_containment")
    val spark = graft.GraftSession.builder("graft-spill-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), dir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[spill] shuffle.partitions=" +
      spark.conf.get("spark.sql.shuffle.partitions") +
      " aqe=" + spark.conf.get("spark.sql.adaptive.enabled") +
      " coalesce=" + spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled", "true"))
    val stages = mutable.ArrayBuffer.empty[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        if (m != null) stages.synchronized {
          stages += StageRow(i.stageId, i.name.takeWhile(_ != '\n').take(60),
            i.numTasks,
            m.shuffleReadMetrics.totalBytesRead >> 20,
            m.shuffleWriteMetrics.bytesWritten >> 20,
            m.memoryBytesSpilled >> 20, m.diskBytesSpilled >> 20,
            m.peakExecutionMemory >> 20, m.executorCpuTime / 1e9)
        }
      }
    }
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT/daemon warm
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      // rep 1 warms the family cache so rep 2 attributes the query alone
      for (rep <- 1 to 2) {
        stages.synchronized(stages.clear())
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSparkShims.drainListenerBus(spark.sparkContext)
        spark.sparkContext.removeSparkListener(listener)
        val rows = stages.synchronized(stages.toVector)
        val memSp = rows.map(_.memSpillMB).sum
        val dskSp = rows.map(_.diskSpillMB).sum
        println(f"[spill] $name%-28s rep=$rep rows=$n%-8d ${secs}%7.2f s  " +
          f"stages=${rows.size}%-3d memSpill=${memSp}%6d MB diskSpill=${dskSp}%6d MB")
        if (rep == 2) {
          // top stages by (spill, then cpu) — the attribution targets
          rows.sortBy(r => (-(r.memSpillMB + r.diskSpillMB), -r.cpuSec))
            .take(6).foreach { r =>
              println(f"[spill]   stage=${r.id}%-5d tasks=${r.tasks}%-4d " +
                f"shRead=${r.shuffleReadMB}%6d shWrite=${r.shuffleWriteMB}%6d " +
                f"memSp=${r.memSpillMB}%6d dskSp=${r.diskSpillMB}%6d " +
                f"peak=${r.peakExecMB}%5d cpu=${r.cpuSec}%7.1f  ${r.name}")
            }
        }
      }
    }
    spark.stop()
  }
}
