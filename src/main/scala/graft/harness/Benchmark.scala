package graft.harness

/** Benchmark plugin surface, mirroring the reference harness
  * (/root/reference/timedf/benchmark.py:27-87): a results container with
  * validation, a benchmark base trait, and a static registry replacing the
  * reference's dynamic module import (JVM-idiomatic).
  */

/** Validated measurement set. Measurement values are seconds (finite
  * doubles); params are stringly-typed run metadata (reference coerces all
  * params to str, timedf/benchmark.py:44-61).
  */
final case class BenchmarkResults(
    measurements: Map[String, Double],
    params: Map[String, String] = Map.empty) {
  require(measurements.nonEmpty, "measurements must be non-empty")
  measurements.foreach { case (k, v) =>
    require(k.nonEmpty, "measurement name must be non-empty")
    require(!v.isNaN && !v.isInfinite && v >= 0,
      s"measurement $k must be a finite non-negative duration, got $v")
  }
}

/** Run parameters (reference: argparse Namespace → Dict). */
final case class RunParams(
    dataDir: String,
    backend: String = "spark",
    numThreads: Int = Runtime.getRuntime.availableProcessors(),
    iterations: Int = 1,
    noMl: Boolean = false,
    validation: Boolean = false,
    extra: Map[String, String] = Map.empty)

/** One benchmark-specific CLI flag (reference add_benchmark_args,
  * timedf/benchmark.py:68-71): benchmarks declare flags, the CLI parses
  * them, and the values land in RunParams.extra keyed by `name`.
  */
final case class ArgSpec(
    name: String,
    takesValue: Boolean = true,
    default: Option[String] = None,
    help: String = "")

/** Base benchmark (reference BaseBenchmark, timedf/benchmark.py:64-87). */
trait BaseBenchmark {
  def name: String

  /** Benchmark-specific CLI flags (reference's add_benchmark_args plugin
    * hook). Parsed values are delivered in RunParams.extra.
    */
  def benchmarkArgs: Seq[ArgSpec] = Seq.empty

  /** Execute one iteration; returns validated results. */
  def run(params: RunParams): BenchmarkResults = {
    val res = runBenchmark(params)
    res // construction already validates
  }

  protected def runBenchmark(params: RunParams): BenchmarkResults

  /** File patterns this benchmark stages — the fixture/CSV analogs of the
    * reference's per-benchmark S3 folders. Empty → loadData unsupported.
    */
  def dataFiles: Seq[String] = Seq.empty

  /** Dataset staging hook (reference load_data,
    * timedf/benchmark.py:82-87; default raises when the benchmark declares
    * no data files). `sourceDir` defaults to the sf0.001 fixtures — the
    * offline stand-in for the reference's hardcoded public bucket.
    */
  def loadData(targetDir: String, reload: Boolean,
               sourceDir: Option[String] = None): Unit =
    if (dataFiles.isEmpty)
      throw new UnsupportedOperationException(
        s"benchmark $name defines no load_data")
    else {
      val staged = DataStaging.stage(sourceDir.getOrElse("/root/testdata/sf0.001"),
        targetDir, dataFiles, reload)
      // reference parity (ny_taxi_ml.py:314-325): staged archives are
      // extracted in place, with the path-traversal guard
      staged.filter(_.endsWith(".tar.gz")).foreach { arc =>
        println(s"Extracting $arc...")
        DataStaging.extractTarGz(s"$targetDir/$arc", targetDir)
      }
    }
}

/** Static registry (replaces importlib-by-name,
  * /root/reference/timedf/benchmark.py:8-24).
  */
object BenchmarkRegistry {
  import graft.benchmarks._

  val all: Map[String, () => BaseBenchmark] = Map(
    "example_benchmark" -> (() => new ExampleBenchmark),
    "ny_taxi" -> (() => new NyTaxiBenchmark),
    "ny_taxi_ml" -> (() => new NyTaxiMlBenchmark),
    "plasticc" -> (() => new PlasticcBenchmark),
    "curation" -> (() => new CurationBenchmark))

  def create(name: String): BaseBenchmark =
    all.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown benchmark '$name'; known: ${all.keys.toSeq.sorted.mkString(", ")}"))()
}
