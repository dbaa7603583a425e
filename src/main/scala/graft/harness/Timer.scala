package graft.harness

import scala.collection.mutable

/** Nested wall-clock timer with dotted hierarchical measurement names.
  *
  * Semantics per the reference's timer (/root/reference/timedf/timer.py:11-155):
  *  - `timeit(name) { body }` opens a scope; nested scopes produce dotted
  *    names (`total.load_data`).
  *  - Re-entering the same dotted name accumulates durations.
  *  - A scope name must be non-empty and must not contain the separator.
  *  - `results` returns seconds as Double keyed by dotted name;
  *    `reset()` clears state.
  *
  * Thread-confined by design (one TimerManager per benchmark run), matching
  * the reference's single-threaded measurement model.
  */
final class TimerManager {
  private val stack = mutable.ArrayBuffer.empty[String]
  private val acc = mutable.LinkedHashMap.empty[String, Double]

  def timeit[T](name: String)(body: => T): T = {
    require(name.nonEmpty, "timer name must be non-empty")
    require(!name.contains('.'), s"timer name must not contain '.': $name")
    stack += name
    val key = stack.mkString(".")
    val t0 = System.nanoTime()
    try body
    finally {
      val dt = (System.nanoTime() - t0) / 1e9
      acc.updateWith(key) {
        case Some(prev) => Some(prev + dt)
        case None => Some(dt)
      }
      stack.remove(stack.length - 1)
    }
  }

  /** Measurements so far; fails if called inside an open scope (mirrors the
    * reference's guard against reading a running timer).
    */
  def results: Map[String, Double] = {
    require(stack.isEmpty, s"timer scope still open: ${stack.mkString(".")}")
    acc.toMap
  }

  def reset(): Unit = {
    require(stack.isEmpty, "cannot reset inside an open scope")
    acc.clear()
  }
}
