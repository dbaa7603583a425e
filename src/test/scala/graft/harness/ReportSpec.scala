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

  test("xlsx report is a valid OOXML package with the reference layout") {
    val path = writeFixture()
    val agg = ReportCli.aggregate(ReportCli.measurementsLong(spark, path), "median")
    val sheets = ReportCli.xlsxSheets(agg, Seq("node" -> "n1"))
    assert(sheets.map(_._1) === Seq("ny_taxi", "HostInfo"))
    // reference layout: header row (backend, <backends...>), then one row
    // per measurement with the aggregated duration
    val ny = sheets.head._2
    assert(ny.head === Seq("backend", "spark"))
    assert(ny.contains(Seq("total", 4.0)))
    assert(ny.contains(Seq("total.Query1", 2.0)))
    // one chart per measurement on the benchmark sheet; none on HostInfo
    assert(sheets.head._3.size === 2)
    assert(sheets.last._3.isEmpty)

    val out = Files.createTempDirectory("graft-xlsx").toString + "/report.xlsx"
    Xlsx.writeWithCharts(out, sheets)
    val zip = new java.util.zip.ZipFile(out)
    try {
      val entries = {
        val e = zip.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result().toSet
      }
      // the minimal OOXML part set every reader requires, plus the
      // drawing/chart chain for the benchmark sheet
      assert(entries === Set("[Content_Types].xml", "_rels/.rels",
        "xl/workbook.xml", "xl/_rels/workbook.xml.rels",
        "xl/worksheets/sheet1.xml", "xl/worksheets/sheet2.xml",
        "xl/worksheets/_rels/sheet1.xml.rels",
        "xl/drawings/drawing1.xml", "xl/drawings/_rels/drawing1.xml.rels",
        "xl/charts/chart1.xml", "xl/charts/chart2.xml"))
      def read(name: String): String = {
        val in = zip.getInputStream(zip.getEntry(name))
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      }
      // every XML part must be well-formed (a reader hard-fails otherwise)
      val db = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder()
      entries.filter(_.endsWith(".xml")).foreach { e =>
        db.parse(new java.io.ByteArrayInputStream(
          read(e).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
      val wb = read("xl/workbook.xml")
      assert(wb.contains("""<sheet name="ny_taxi" sheetId="1" r:id="rId1"/>"""))
      assert(wb.contains("""<sheet name="HostInfo" sheetId="2" r:id="rId2"/>"""))
      val s1 = read("xl/worksheets/sheet1.xml")
      assert(s1.contains("""<c r="A1" t="inlineStr"><is><t>backend</t></is></c>"""))
      assert(s1.contains("""<c r="B2"><v>4.0</v></c>""") ||
        s1.contains("""<c r="B3"><v>4.0</v></c>"""))
      assert(s1.contains("""<drawing r:id="rId1"/>"""))
      // the rels chain: sheet → drawing → charts
      assert(read("xl/worksheets/_rels/sheet1.xml.rels")
        .contains("Target=\"../drawings/drawing1.xml\""))
      val drels = read("xl/drawings/_rels/drawing1.xml.rels")
      assert(drels.contains("Target=\"../charts/chart1.xml\""))
      assert(drels.contains("Target=\"../charts/chart2.xml\""))
      val drawing = read("xl/drawings/drawing1.xml")
      assert("""<xdr:twoCellAnchor>""".r.findAllIn(drawing).size === 2)
      // charts reference the sheet's own cells (categories = header
      // backends, values = the measurement's row) with the reference's
      // titles/axes
      val c1 = read("xl/charts/chart1.xml")
      assert(c1.contains("<a:t>Query: total</a:t>"))
      assert(c1.contains("<c:f>'ny_taxi'!$B$1:$B$1</c:f>")) // categories
      assert(c1.contains("<c:f>'ny_taxi'!$B$2:$B$2</c:f>")) // values
      assert(c1.contains("<a:t>Time, s</a:t>") && c1.contains("<a:t>Task</a:t>"))
      assert(c1.contains("""<c:barDir val="bar"/>"""))
      val ct = read("[Content_Types].xml")
      assert(ct.contains("/xl/worksheets/sheet2.xml"))
      assert(ct.contains("/xl/drawings/drawing1.xml"))
      assert(ct.contains("/xl/charts/chart2.xml"))
      assert(ct.contains("drawingml.chart+xml"))
      // sheet2 (HostInfo) carries no drawing reference
      assert(!read("xl/worksheets/sheet2.xml").contains("<drawing"))
    } finally zip.close()
    // helpers: A1-style refs and Excel's sheet-name rules
    assert(Xlsx.colRef(0) === "A" && Xlsx.colRef(25) === "Z" &&
      Xlsx.colRef(26) === "AA" && Xlsx.colRef(27 * 26) === "AAA")
    assert(Xlsx.sanitizeSheetName("a/b[c]:d*e?f\\g") === "a_b_c__d_e_f_g")
    assert(Xlsx.sanitizeSheetName("x" * 40).length === 31)
  }
}
