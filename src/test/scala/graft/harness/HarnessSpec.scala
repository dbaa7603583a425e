package graft.harness

import org.scalatest.funsuite.AnyFunSuite

class HarnessSpec extends AnyFunSuite {

  test("BenchmarkResults validates measurements") {
    intercept[IllegalArgumentException] { BenchmarkResults(Map.empty) }
    intercept[IllegalArgumentException] {
      BenchmarkResults(Map("x" -> Double.NaN))
    }
    intercept[IllegalArgumentException] {
      BenchmarkResults(Map("x" -> -1.0))
    }
    val ok = BenchmarkResults(Map("total" -> 1.5), Map("k" -> "v"))
    assert(ok.measurements("total") === 1.5)
  }

  test("registry knows all four benchmarks and rejects unknown") {
    assert(BenchmarkRegistry.all.keySet ===
      Set("example_benchmark", "ny_taxi", "ny_taxi_ml", "plasticc"))
    intercept[IllegalArgumentException] { BenchmarkRegistry.create("nope") }
    assert(BenchmarkRegistry.create("ny_taxi").name === "ny_taxi")
  }

  test("results JSONL round-trip preserves schema fields") {
    val it = Results.Iteration(
      benchmark = "b", backend = "spark", iterationNo = 1, runId = 42L,
      dateIso = "2026-01-01T00:00:00Z",
      hostInfo = Map("node" -> "n\"quote"),
      params = Map("tag" -> "line1\nline2"),
      measurements = Seq(Results.Measurement("total", 1.25),
        Results.Measurement("total.load", 0.5)))
    val dir = java.nio.file.Files.createTempDirectory("graft-results")
    val path = dir.resolve("r.jsonl").toString
    Results.append(path, it)
    Results.append(path, it.copy(iterationNo = 2))
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    assert(lines.size === 2)
    // JSON escaping sanity: parse with a strict check for the escaped quote
    assert(lines.get(0).contains("n\\\"quote"))
    assert(lines.get(0).contains("line1\\nline2"))
    assert(lines.get(0).contains("\"duration_s\": 1.25"))
    assert(lines.get(1).contains("\"iteration_no\": 2"))
  }

  test("CLI parse covers all flags") {
    val (name, p, save, tag) = BenchmarkRun.parse(Array(
      "ny_taxi", "-data_file", "/d", "-iterations", "3", "-no_ml",
      "-num_threads", "4", "-backend", "lab", "-save_results", "/tmp/x.jsonl",
      "-tag", "t1", "-validation"))
    assert(name === "ny_taxi")
    assert(p.dataDir === "/d" && p.iterations === 3 && p.noMl && p.validation)
    assert(p.numThreads === 4 && p.backend === "lab")
    assert(save.contains("/tmp/x.jsonl") && tag === "t1")
    intercept[IllegalArgumentException] {
      BenchmarkRun.parse(Array("x", "-bogus"))
    }
  }

  test("example benchmark runs end-to-end with expected stage names") {
    val res = BenchmarkRegistry.create("example_benchmark")
      .run(RunParams(dataDir = "/root/testdata/sf0.001"))
    assert(res.measurements.keySet ===
      Set("total", "total.load_data", "total.feature_1", "total.feature_2"))
    assert(res.measurements("total") >=
      res.measurements("total.load_data"))
  }

  test("ny_taxi benchmark produces stable validation digests across runs") {
    val params = RunParams(dataDir = "/root/testdata/sf0.001", validation = true)
    val bench = BenchmarkRegistry.create("ny_taxi")
    def digests(r: BenchmarkResults) =
      r.params.filter(_._1.startsWith("validation_"))
    val a = digests(bench.run(params))
    val b = digests(bench.run(params))
    assert(a.keySet === Set("validation_Query1", "validation_Query2",
      "validation_Query3", "validation_Query4"))
    assert(a === b)
  }

  test("hostInfo reports basic facts") {
    val h = Results.hostInfo()
    assert(h("cpu_count").toInt > 0)
    assert(h.contains("os"))
  }

  test("memory tracker observes nonzero peak") {
    val mt = new MemoryTracker(sampleIntervalMs = 5)
    mt.start()
    Thread.sleep(30)
    assert(mt.stop() > 0)
  }
}
