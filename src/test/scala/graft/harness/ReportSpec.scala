package graft.harness

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession.spark

class ReportSpec extends AnyFunSuite {

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("graft-report").toString
    val path = s"$dir/r.jsonl"
    def it(iter: Int, total: Double) = Results.Iteration(
      benchmark = "ny_taxi", backend = "spark", iterationNo = iter,
      runId = 7L, dateIso = "2026-01-01T00:00:00Z",
      hostInfo = Map("node" -> "n1", "cpu_model" -> "x"),
      params = Map.empty,
      measurements = Seq(
        Results.Measurement("total", total),
        Results.Measurement("total.Query1", total / 2)))
    Results.append(path, it(1, 2.0))
    Results.append(path, it(2, 4.0))
    Results.append(path, it(3, 6.0))
    path
  }

  test("long → pivot wide → aggregate median/mean/min") {
    val path = writeFixture()
    val long = ReportCli.measurementsLong(spark, path)
    assert(long.count() === 6)
    val wide = ReportCli.pivotWide(long)
    assert(wide.columns.toSet ===
      Set("benchmark", "backend", "run_id", "iteration_no", "total", "total.Query1"))
    assert(wide.count() === 3)
    def aggOf(how: String): Map[String, Double] =
      ReportCli.aggregate(long, how).collect()
        .map(r => r.getString(2) -> r.getDouble(3)).toMap
    assert(aggOf("median")("total") === 4.0)
    assert(aggOf("mean")("total") === 4.0)
    assert(aggOf("min")("total") === 2.0)
    assert(aggOf("median")("total.Query1") === 2.0)
    intercept[IllegalArgumentException] { ReportCli.aggregate(long, "max") }
  }

  test("chart series, CSV emission and ascii bars") {
    val path = writeFixture()
    val agg = ReportCli.aggregate(ReportCli.measurementsLong(spark, path), "median")
    val series = ReportCli.chartSeries(agg)
    assert(series.map(_._1) === Seq("total", "total.Query1"))
    assert(series.head._2 === Seq(("spark", 4.0)))
    val dir = Files.createTempDirectory("graft-charts").toString
    val files = ReportCli.writeChartCsvs(series, dir)
    assert(files.size === 2)
    val csv = Files.readString(java.nio.file.Paths.get(files.head))
    assert(csv.startsWith("backend,duration_s\n"))
    assert(csv.contains("spark,4.000000"))
    val ascii = ReportCli.asciiCharts(series)
    assert(ascii.contains("### Query: total (time, s)"))
    assert(ascii.contains("#")) // a bar rendered
  }

  test("markdown render + host uniformity") {
    val path = writeFixture()
    val long = ReportCli.measurementsLong(spark, path)
    val md = ReportCli.markdown(ReportCli.aggregate(long, "median"), "median")
    assert(md.contains("## ny_taxi / spark"))
    assert(md.contains("| total | 4.000 | 3 |"))
    assert(ReportCli.hostUniform(spark, path))
  }
}
