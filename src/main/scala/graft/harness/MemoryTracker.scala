package graft.harness

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import scala.util.Try

/** Peak system-memory sampler. The reference forks a child process polling
  * /proc/meminfo every 1 ms (/root/reference/timedf/benchmark_utils.py:163-262);
  * a daemon thread in the same JVM gives the same signal without the fork
  * (local-mode Spark is one JVM anyway). Records max used = MemTotal −
  * MemAvailable, in MB.
  */
final class MemoryTracker(sampleIntervalMs: Long = 50L) {
  private val running = new AtomicBoolean(false)
  private val maxUsedMb = new AtomicLong(0L)
  private var thread: Option[Thread] = None

  private def usedMb(): Long = Try {
    val kv = scala.io.Source.fromFile("/proc/meminfo").getLines()
      .map(_.split(':')).collect {
        case Array(k, v) => k.trim -> v.trim.replace(" kB", "").toLong
      }.toMap
    (kv("MemTotal") - kv("MemAvailable")) / 1024
  }.getOrElse(0L)

  def start(): Unit = if (running.compareAndSet(false, true)) {
    maxUsedMb.set(usedMb())
    val t = new Thread(() => {
      while (running.get()) {
        maxUsedMb.getAndUpdate(m => math.max(m, usedMb()))
        Thread.sleep(sampleIntervalMs)
      }
    }, "graft-memory-tracker")
    t.setDaemon(true)
    t.start()
    thread = Some(t)
  }

  /** Stop sampling and return peak used MB observed. */
  def stop(): Long = {
    running.set(false)
    thread.foreach(_.join(1000))
    thread = None
    maxUsedMb.get()
  }
}
