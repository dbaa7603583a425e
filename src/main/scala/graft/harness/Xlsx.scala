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
  * This closes the reference's binary-report surface
  * (/root/reference/timedf/scripts/report_xlsx.py:23-98): round 2 shipped
  * markdown + chart CSVs as the offline stand-in; the file format itself
  * needed no library after all.
  */
object Xlsx {

  /** Write `sheets` (name → rows of cells) as an xlsx file. Cell values:
    * String → inline string; Byte/Short/Int/Long/Float/Double/BigDecimal →
    * number; null → empty cell. Sheet names are sanitized to Excel's
    * 31-char / no-special-chars rule.
    */
  def write(path: String, sheets: Seq[(String, Seq[Seq[Any]])]): Unit = {
    require(sheets.nonEmpty, "xlsx needs at least one sheet")
    val names = dedupe(sheets.map(s => sanitizeSheetName(s._1)))
    val out = new ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    def part(name: String, body: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(body.getBytes(StandardCharsets.UTF_8))
      out.closeEntry()
    }
    try {
      val decl = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
      part("[Content_Types].xml",
        decl + "\n<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
          "<Default Extension=\"rels\" ContentType=\"application/vnd.openxmlformats-package.relationships+xml\"/>" +
          "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
          "<Override PartName=\"/xl/workbook.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml\"/>" +
          sheets.indices.map(i =>
            s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
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
      sheets.zipWithIndex.foreach { case ((_, rows), i) =>
        part(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(rows))
      }
    } finally out.close()
  }

  private def sheetXml(rows: Seq[Seq[Any]]): String = {
    val sb = new StringBuilder(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
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
    sb.append("</sheetData></worksheet>")
    sb.toString
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
