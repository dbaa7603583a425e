package graft.harness

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference timer unit tests
  * (/root/reference/timedf/test_timer.py:9-113).
  */
class TimerSpec extends AnyFunSuite {

  test("nested timing produces dotted names and parent >= sum of children") {
    val tm = new TimerManager
    tm.timeit("total") {
      tm.timeit("load") { Thread.sleep(20) }
      tm.timeit("query") { Thread.sleep(10) }
    }
    val r = tm.results
    assert(r.keySet === Set("total", "total.load", "total.query"))
    assert(r("total") >= r("total.load") + r("total.query"))
    assert(r("total.load") >= 0.019)
  }

  test("repeated names accumulate") {
    val tm = new TimerManager
    tm.timeit("total") {
      (1 to 3).foreach(_ => tm.timeit("step") { Thread.sleep(5) })
    }
    val r = tm.results
    assert(r("total.step") >= 0.014)
    assert(r.size === 2)
  }

  test("empty or dotted timer name rejected") {
    val tm = new TimerManager
    intercept[IllegalArgumentException] { tm.timeit("") {} }
    intercept[IllegalArgumentException] { tm.timeit("a.b") {} }
  }

  test("results inside open scope rejected") {
    val tm = new TimerManager
    intercept[IllegalArgumentException] {
      tm.timeit("outer") { tm.results }
    }
  }

  test("reset clears accumulated measurements") {
    val tm = new TimerManager
    tm.timeit("a") {}
    tm.reset()
    assert(tm.results.isEmpty)
    tm.timeit("b") {}
    assert(tm.results.keySet === Set("b"))
  }

  test("wall time approximately matches slept duration") {
    val tm = new TimerManager
    tm.timeit("sleep") { Thread.sleep(50) }
    val t = tm.results("sleep")
    assert(t >= 0.049 && t <= 0.5, s"wall time $t out of expected band")
  }

  test("timer value propagates body result and exceptions close scope") {
    val tm = new TimerManager
    assert(tm.timeit("v") { 42 } === 42)
    intercept[RuntimeException] {
      tm.timeit("boom") { throw new RuntimeException("x") }
    }
    // scope closed despite exception: results accessible
    assert(tm.results.keySet === Set("v", "boom"))
  }
}
