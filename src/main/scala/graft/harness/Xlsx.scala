package graft.harness

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal xlsx (ECMA-376 / OOXML SpreadsheetML) writer on java.util.zip —
  * no external dependency. An .xlsx file is a zip of XML parts; the
  * minimal readable profile is [Content_Types].xml, the package rels, a
  * workbook with a sheet list, and one worksheet XML per sheet. Strings
  * are written as inline strings (no sharedStrings table), numbers as
  * plain `<v>` values — every spreadsheet reader (Excel, LibreOffice,
  * pandas/openpyxl) accepts this profile.
  *
  * Charts: each sheet may carry embedded DrawingML bar charts
  * ([[BarChart]]) — a drawing part anchored on the sheet plus one
  * chartSpace part per chart, wired through the usual rels chain
  * (sheet → drawing → chart). This is the same part structure any
  * xlsx-writing library emits, closing the reference's per-query chart
  * surface (/root/reference/timedf/scripts/report_xlsx.py:41-60,96).
  */
object Xlsx {

  /** A horizontal bar chart reading its series from the OWN sheet's cells
    * (0-based coordinates): series name from (valueRow, 0), category
    * labels from labelRow cols [colFrom, colTo], values from valueRow
    * cols [colFrom, colTo]. Anchored with its top-left at (anchorRow,
    * anchorCol), spanning ~8 columns × ~15 rows.
    */
  case class BarChart(title: String, labelRow: Int, valueRow: Int,
                      colFrom: Int, colTo: Int,
                      anchorRow: Int, anchorCol: Int)

  /** Write `sheets` (name → rows of cells) as an xlsx file. Cell values:
    * String → inline string; Byte/Short/Int/Long/Float/Double/BigDecimal →
    * number; null → empty cell. Sheet names are sanitized to Excel's
    * 31-char / no-special-chars rule.
    */
  def write(path: String, sheets: Seq[(String, Seq[Seq[Any]])]): Unit =
    writeWithCharts(path, sheets.map { case (n, rows) => (n, rows, Nil) })

  def writeWithCharts(path: String,
                      sheets: Seq[(String, Seq[Seq[Any]], Seq[BarChart])]): Unit = {
    require(sheets.nonEmpty, "xlsx needs at least one sheet")
    val names = dedupe(sheets.map(s => sanitizeSheetName(s._1)))
    // global numbering: drawingD per sheet-with-charts, chartC per chart
    val drawingIdx: Map[Int, Int] = // sheet index → drawing number
      sheets.zipWithIndex.filter(_._1._3.nonEmpty).map(_._2).zipWithIndex
        .map { case (si, di) => si -> (di + 1) }.toMap
    val chartBase: Map[Int, Int] = { // sheet index → first chart number - 1
      var acc = 0
      sheets.zipWithIndex.map { case ((_, _, cs), si) =>
        val r = si -> acc; acc += cs.size; r
      }.toMap
    }
    val out = new ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    def part(name: String, body: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(body.getBytes(StandardCharsets.UTF_8))
      out.closeEntry()
    }
    val decl = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    try {
      part("[Content_Types].xml",
        decl + "\n<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
          "<Default Extension=\"rels\" ContentType=\"application/vnd.openxmlformats-package.relationships+xml\"/>" +
          "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
          "<Override PartName=\"/xl/workbook.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml\"/>" +
          sheets.indices.map(i =>
            s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
            .mkString +
          drawingIdx.values.toSeq.sorted.map(d =>
            s"""<Override PartName="/xl/drawings/drawing$d.xml" ContentType="application/vnd.openxmlformats-officedocument.drawing+xml"/>""")
            .mkString +
          (1 to sheets.map(_._3.size).sum).map(c =>
            s"""<Override PartName="/xl/charts/chart$c.xml" ContentType="application/vnd.openxmlformats-officedocument.drawingml.chart+xml"/>""")
            .mkString +
          "</Types>")
      part("_rels/.rels",
        decl + "\n<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
          "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument\" Target=\"xl/workbook.xml\"/>" +
          "</Relationships>")
      part("xl/workbook.xml",
        decl + "\n<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"" +
          " xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\"><sheets>" +
          names.zipWithIndex.map { case (n, i) =>
            s"""<sheet name="${escape(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString +
          "</sheets></workbook>")
      part("xl/_rels/workbook.xml.rels",
        decl + "\n<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
          sheets.indices.map(i =>
            s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""")
            .mkString +
          "</Relationships>")
      sheets.zipWithIndex.foreach { case ((_, rows, charts), i) =>
        part(s"xl/worksheets/sheet${i + 1}.xml",
          sheetXml(rows, hasDrawing = charts.nonEmpty))
        if (charts.nonEmpty) {
          val d = drawingIdx(i)
          part(s"xl/worksheets/_rels/sheet${i + 1}.xml.rels",
            decl + "\n<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
              s"""<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/drawing" Target="../drawings/drawing$d.xml"/>""" +
              "</Relationships>")
          part(s"xl/drawings/drawing$d.xml", drawingXml(charts))
          part(s"xl/drawings/_rels/drawing$d.xml.rels",
            decl + "\n<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
              charts.indices.map { ci =>
                val c = chartBase(i) + ci + 1
                s"""<Relationship Id="rId${ci + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/chart" Target="../charts/chart$c.xml"/>"""
              }.mkString +
              "</Relationships>")
          charts.zipWithIndex.foreach { case (ch, ci) =>
            part(s"xl/charts/chart${chartBase(i) + ci + 1}.xml",
              chartXml(ch, names(i)))
          }
        }
      }
    } finally out.close()
  }

  private def sheetXml(rows: Seq[Seq[Any]], hasDrawing: Boolean): String = {
    val sb = new StringBuilder(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"" +
      " xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\"><sheetData>")
    rows.zipWithIndex.foreach { case (cells, r) =>
      sb.append(s"""<row r="${r + 1}">""")
      cells.zipWithIndex.foreach { case (v, c) =>
        val ref = colRef(c) + (r + 1)
        v match {
          case null => ()
          case n: Byte => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
          case n: Short => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
          case n: Int => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
          case n: Long => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
          case n: Float => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
          case n: Double => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
          case n: BigDecimal => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
          case s =>
            sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${escape(s.toString)}</t></is></c>""")
        }
      }
      sb.append("</row>")
    }
    sb.append("</sheetData>")
    if (hasDrawing) sb.append("""<drawing r:id="rId1"/>""")
    sb.append("</worksheet>")
    sb.toString
  }

  /** One twoCellAnchor graphicFrame per chart; chart rIds are positional
    * within the drawing's own rels part.
    */
  private def drawingXml(charts: Seq[BarChart]): String = {
    val sb = new StringBuilder(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("\n<xdr:wsDr xmlns:xdr=\"http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing\"" +
      " xmlns:a=\"http://schemas.openxmlformats.org/drawingml/2006/main\">")
    charts.zipWithIndex.foreach { case (ch, ci) =>
      sb.append("<xdr:twoCellAnchor>")
      sb.append(s"<xdr:from><xdr:col>${ch.anchorCol}</xdr:col><xdr:colOff>0</xdr:colOff>" +
        s"<xdr:row>${ch.anchorRow}</xdr:row><xdr:rowOff>0</xdr:rowOff></xdr:from>")
      sb.append(s"<xdr:to><xdr:col>${ch.anchorCol + 8}</xdr:col><xdr:colOff>0</xdr:colOff>" +
        s"<xdr:row>${ch.anchorRow + 15}</xdr:row><xdr:rowOff>0</xdr:rowOff></xdr:to>")
      sb.append("<xdr:graphicFrame macro=\"\">")
      sb.append(s"""<xdr:nvGraphicFramePr><xdr:cNvPr id="${ci + 2}" name="Chart ${ci + 1}"/>""" +
        "<xdr:cNvGraphicFramePr/></xdr:nvGraphicFramePr>")
      sb.append("<xdr:xfrm><a:off x=\"0\" y=\"0\"/><a:ext cx=\"0\" cy=\"0\"/></xdr:xfrm>")
      sb.append("<a:graphic><a:graphicData uri=\"http://schemas.openxmlformats.org/drawingml/2006/chart\">" +
        "<c:chart xmlns:c=\"http://schemas.openxmlformats.org/drawingml/2006/chart\"" +
        " xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\"" +
        s""" r:id="rId${ci + 1}"/></a:graphicData></a:graphic>""")
      sb.append("</xdr:graphicFrame><xdr:clientData/></xdr:twoCellAnchor>")
    }
    sb.append("</xdr:wsDr>")
    sb.toString
  }

  /** Minimal chartSpace: one clustered horizontal-bar series with cell
    * references into `sheetName` — the reference chart's exact shape
    * (title "Query: <name>", value axis "Time, s", category axis "Task").
    */
  private def chartXml(ch: BarChart, sheetName: String): String = {
    val sheet = "'" + sheetName.replace("'", "''") + "'"
    def ref(row: Int, c0: Int, c1: Int): String =
      s"$sheet!$$${colRef(c0)}$$${row + 1}:$$${colRef(c1)}$$${row + 1}"
    def axTitle(text: String): String =
      "<c:title><c:tx><c:rich><a:bodyPr/><a:p><a:r><a:t>" + escape(text) +
        "</a:t></a:r></a:p></c:rich></c:tx><c:overlay val=\"0\"/></c:title>"
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      "\n<c:chartSpace xmlns:c=\"http://schemas.openxmlformats.org/drawingml/2006/chart\"" +
      " xmlns:a=\"http://schemas.openxmlformats.org/drawingml/2006/main\"" +
      " xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\">" +
      "<c:chart>" +
      axTitle(ch.title) +
      "<c:autoTitleDeleted val=\"0\"/>" +
      "<c:plotArea><c:layout/>" +
      "<c:barChart><c:barDir val=\"bar\"/><c:grouping val=\"clustered\"/><c:varyColors val=\"0\"/>" +
      "<c:ser><c:idx val=\"0\"/><c:order val=\"0\"/>" +
      s"""<c:tx><c:strRef><c:f>$sheet!$$A$$${ch.valueRow + 1}</c:f></c:strRef></c:tx>""" +
      s"<c:cat><c:strRef><c:f>${ref(ch.labelRow, ch.colFrom, ch.colTo)}</c:f></c:strRef></c:cat>" +
      s"<c:val><c:numRef><c:f>${ref(ch.valueRow, ch.colFrom, ch.colTo)}</c:f></c:numRef></c:val>" +
      "</c:ser>" +
      "<c:axId val=\"111111111\"/><c:axId val=\"222222222\"/></c:barChart>" +
      "<c:catAx><c:axId val=\"111111111\"/><c:scaling><c:orientation val=\"minMax\"/></c:scaling>" +
      "<c:delete val=\"0\"/><c:axPos val=\"l\"/>" + axTitle("Task") +
      "<c:crossAx val=\"222222222\"/></c:catAx>" +
      "<c:valAx><c:axId val=\"222222222\"/><c:scaling><c:orientation val=\"minMax\"/></c:scaling>" +
      "<c:delete val=\"0\"/><c:axPos val=\"b\"/>" + axTitle("Time, s") +
      "<c:crossAx val=\"111111111\"/></c:valAx>" +
      "</c:plotArea><c:plotVisOnly val=\"1\"/><c:dispBlanksAs val=\"gap\"/>" +
      "</c:chart></c:chartSpace>"
  }

  /** 0-based column index → A1-style letters (0→A, 25→Z, 26→AA). */
  private[harness] def colRef(c: Int): String = {
    var n = c
    val sb = new StringBuilder
    while (n >= 0) {
      sb.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    sb.toString
  }

  private[harness] def sanitizeSheetName(n: String): String = {
    val cleaned = n.replaceAll("[\\[\\]:*?/\\\\]", "_")
    val trimmed = if (cleaned.isEmpty) "Sheet" else cleaned
    trimmed.take(31)
  }

  private def dedupe(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Set.empty[String]
    names.map { n =>
      var cand = n
      var i = 1
      while (seen.contains(cand)) { cand = (n.take(28) + "_" + i).take(31); i += 1 }
      seen += cand
      cand
    }
  }

  private def escape(s: String): String =
    s.flatMap {
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '&' => "&amp;"
      case '"' => "&quot;"
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
      case c => c.toString
    }
}
