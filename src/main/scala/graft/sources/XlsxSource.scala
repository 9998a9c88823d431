package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipInputStream, ZipOutputStream}

import scala.collection.mutable

import graft.plans.SqlGate
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.w3c.dom.Element

/** Zero-dependency .xlsx reader — the BINARY half of the reference's
  * excel tools (`excel_tool.py:564-612` loads sheets with openpyxl;
  * the query semantics on top already live in
  * [[graft.plans.SqlGate.sheetSql]]). An .xlsx is a ZIP of
  * SpreadsheetML parts, and the JDK ships both halves of the codec:
  * `java.util.zip.ZipInputStream` for the container and `javax.xml`
  * DOM for the parts — the same zero-dependency rule as the
  * multimodal tier's Inflater-backed FlateDecode.
  *
  * Mirrored contract (openpyxl `values_only` + the tool's framing):
  *  - sheet ORDER and names from `xl/workbook.xml`, worksheet parts
  *    resolved through `xl/_rels/workbook.xml.rels`;
  *  - cells: `t="s"` shared strings (with rich-text runs flattened),
  *    `t="inlineStr"`, `t="b"` booleans, numbers / cached formula
  *    values from `<v>`; absent cells are None (openpyxl's None);
  *  - first row = headers, `None` header → `Column_{i+1}`
  *    (`excel_tool.py:588-591`);
  *  - table name sanitization: spaces AND hyphens → underscores
  *    (`:602`); the `data` alias points at the requested sheet, else
  *    the first (`:567-573`);
  *  - empty sheets are skipped, header-only sheets register as empty
  *    string-typed tables (`:585,610-612`).
  *
  * Column types: the reference gets types from openpyxl→pandas;
  * here each column infers deterministically from its cells — all
  * integral → BIGINT, all numeric → DOUBLE, all true/false →
  * BOOLEAN, else STRING — so SUM/AVG over numeric sheets work in
  * Spark SQL exactly as they do over DuckDB's pandas-typed tables.
  *
  * Scale shape: a workbook is a driver-side document (the reference
  * streams it through openpyxl on one node too); the DataFrames it
  * yields are parallelized and from there every downstream operator
  * is ordinary distributed Spark. Tolerant: malformed parts throw
  * IllegalArgumentException with a actionable message, never a JVM
  * error from deep inside a codec.
  */
object XlsxSource {

  /** All ZIP entries, name → bytes. */
  private def unzip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map.empty[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out(e.getName) = zin.readAllBytes()
      zin.closeEntry()
      e = zin.getNextEntry
    }
    out.toMap
  }

  private def xml(bytes: Array[Byte]): Element =
    try {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setFeature(
        "http://apache.org/xml/features/disallow-doctype-decl", true)
      f.setXIncludeAware(false)
      f.setExpandEntityReferences(false)
      val b = f.newDocumentBuilder()
      // a corrupt part must surface as the tolerance contract's
      // IllegalArgumentException, not a SAX printout + SAXException
      b.setErrorHandler(null)
      b.parse(new ByteArrayInputStream(bytes)).getDocumentElement
    } catch {
      case e: IllegalArgumentException => throw e
      case e: Exception => throw new IllegalArgumentException(
        s"malformed xlsx part: ${e.getMessage}")
    }

  private def elems(parent: Element, tag: String): Seq[Element] = {
    val nl = parent.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  /** Concatenated text of every <t> under an element — flattens
    * rich-text runs, openpyxl's values_only behavior. */
  private def tText(e: Element): String =
    elems(e, "t").map(_.getTextContent).mkString

  /** "B2" → 0-based column index (letters only). */
  private[graft] def colIndex(ref: String): Int = {
    var v = 0
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      v = v * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    v - 1
  }

  /** Parse the workbook: ordered (sheetName, rows of Option[String])
    * with booleans normalized to "true"/"false". */
  def parse(bytes: Array[Byte]): Seq[(String, Seq[Seq[Option[String]]])] = {
    val parts =
      try unzip(bytes)
      catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"not a ZIP container: ${e.getMessage}")
      }
    val wbBytes = parts.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException(
        "not an xlsx workbook: xl/workbook.xml missing"))
    val wb = xml(wbBytes)
    // rId → worksheet part path (targets are workbook-relative)
    val rels = parts.get("xl/_rels/workbook.xml.rels").map { rb =>
      elems(xml(rb), "Relationship").map { r =>
        val target = r.getAttribute("Target")
        val path =
          if (target.startsWith("/")) target.drop(1)
          else s"xl/$target"
        r.getAttribute("Id") -> path
      }.toMap
    }.getOrElse(Map.empty)
    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml")
      .map(sb => elems(xml(sb), "si").map(tText).toIndexedSeq)
      .getOrElse(IndexedSeq.empty)
    elems(wb, "sheet").zipWithIndex.map { case (sh, idx) =>
      val name = sh.getAttribute("name")
      val rid = sh.getAttribute("r:id")
      val path = rels.getOrElse(rid, s"xl/worksheets/sheet${idx + 1}.xml")
      val rows: Seq[Seq[Option[String]]] = parts.get(path) match {
        case None => Seq.empty
        case Some(sb) =>
          val cells = elems(xml(sb), "row").map { row =>
            val m = mutable.Map.empty[Int, Option[String]]
            var next = 0 // cells without r attrs fill left-to-right
            elems(row, "c").foreach { c =>
              val ref = c.getAttribute("r")
              val ci = if (ref.nonEmpty) colIndex(ref) else next
              next = ci + 1
              val t = c.getAttribute("t")
              val v: Option[String] = t match {
                case "s" =>
                  elems(c, "v").headOption.map(_.getTextContent.trim)
                    .flatMap(i => scala.util.Try(i.toInt).toOption)
                    .flatMap(shared.lift) // bad index → absent cell
                case "inlineStr" =>
                  elems(c, "is").headOption.map(tText)
                case "b" =>
                  elems(c, "v").headOption.map(v =>
                    if (v.getTextContent.trim == "1") "true" else "false")
                case _ => // n, str (cached formula), d, e, or untyped
                  elems(c, "v").headOption.map(_.getTextContent)
              }
              if (v.isDefined) m(ci) = v
            }
            m
          }
          val width = cells.map(m =>
            if (m.isEmpty) 0 else m.keys.max + 1).maxOption.getOrElse(0)
          cells.map(m => (0 until width).map(i => m.getOrElse(i, None)))
      }
      name -> rows
    }
  }

  /** Per-column deterministic type inference over the data rows. */
  private def inferType(vals: Seq[String]): DataType =
    if (vals.isEmpty) StringType
    else if (vals.forall(v => scala.util.Try(v.toLong).isSuccess))
      LongType
    else if (vals.forall(v => scala.util.Try(v.toDouble).isSuccess))
      DoubleType
    else if (vals.forall(v => v == "true" || v == "false")) BooleanType
    else StringType

  /** Ordered (sheetName, DataFrame) with header-row column names and
    * inferred column types; empty sheets skipped. */
  def sheetFrames(spark: SparkSession,
      bytes: Array[Byte]): Seq[(String, DataFrame)] =
    parse(bytes).collect { case (name, rows) if rows.nonEmpty =>
      val headers = rows.head.zipWithIndex.map { case (h, i) =>
        h.getOrElse(s"Column_${i + 1}")
      }
      val width = headers.length
      val data = rows.tail.map(r =>
        (0 until width).map(i => r.lift(i).flatten.orNull))
      val types = (0 until width).map { i =>
        inferType(data.flatMap(r => Option(r(i))))
      }
      val schema = StructType(headers.zip(types).map { case (h, t) =>
        StructField(h, t, nullable = true)
      })
      val typedRows: Seq[Row] = data.map { r =>
        Row.fromSeq(r.zip(types).map {
          case (null, _) => null
          case (v, LongType) => v.toLong
          case (v, DoubleType) => v.toDouble
          case (v, BooleanType) => v == "true"
          case (v, _) => v
        })
      }
      name -> spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(typedRows).asJava),
        schema)
    }

  /** `excel_info` (`excel_tool.py:333-408`): per-sheet name, header
    * columns (None → Column_{i+1}), column count, and row count
    * EXCLUDING the header, plus the container byte size — as a
    * DataFrame so the report joins/filters like any other source
    * catalog. */
  def info(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val rows = parse(bytes).map { case (name, rws) =>
      val columns = rws.headOption.map(_.zipWithIndex.map {
        case (h, i) => h.getOrElse(s"Column_${i + 1}")
      }).getOrElse(Seq.empty)
      Row(name, columns, columns.length.toLong,
        math.max(0, rws.length - 1).toLong, bytes.length.toLong)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("sheet_name", StringType, nullable = false),
        StructField("columns", ArrayType(StringType, containsNull = false),
          nullable = false),
        StructField("column_count", LongType, nullable = false),
        StructField("row_count", LongType, nullable = false),
        StructField("file_size", LongType, nullable = false))))
  }

  // --- write / append halves (`excel_tool.py:148-330`) -------------

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def colLetters(i: Int): String = {
    var v = i + 1
    val sb = new StringBuilder
    while (v > 0) {
      val r = (v - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      v = (v - 1) / 26
    }
    sb.toString
  }

  private def cellXml(ref: String, v: Any): String = v match {
    case null => ""
    case b: Boolean =>
      s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
    case s0: String =>
      s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(s0)}</t></is></c>"""
    case other =>
      s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(
        other.toString)}</t></is></c>"""
  }

  /** Serialize sheets (name → rows of cell values, row 0 = header)
    * into a VALID minimal .xlsx — [Content_Types], root rels,
    * workbook, workbook rels, one worksheet part per sheet; strings
    * write as inline strings (no sharedStrings part needed),
    * numbers/booleans as native cell types. Round-trips through
    * [[parse]] and opens in openpyxl/Excel. */
  def writeWorkbook(sheets: Seq[(String, Seq[Seq[Any]])]): Array[Byte] = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    val bout = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bout)
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    val n = sheets.length
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
          .mkString + "</Types>")
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>")
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString + "</sheets></workbook>")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
          .mkString + "</Relationships>")
    sheets.zipWithIndex.foreach { case ((_, rows), si) =>
      val body = rows.zipWithIndex.map { case (cells, ri) =>
        s"""<row r="${ri + 1}">""" + cells.zipWithIndex.map {
          case (v, ci) => cellXml(s"${colLetters(ci)}${ri + 1}", v)
        }.mkString + "</row>"
      }.mkString
      entry(s"xl/worksheets/sheet${si + 1}.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
          body + "</sheetData></worksheet>")
    }
    z.close()
    bout.toByteArray
  }

  /** `excel_write` (`excel_tool.py:148-230`): header row from
    * `columns`, then the data rows, one sheet. */
  def write(columns: Seq[String], rows: Seq[Seq[Any]],
      sheet: String = "Sheet1"): Array[Byte] =
    writeWorkbook(Seq(sheet -> (columns +: rows)))

  /** `excel_append` (`excel_tool.py:231-330`): parse the workbook,
    * append rows after the target (default first) sheet's last row,
    * re-serialize. The first row must carry headers — appending to a
    * headerless sheet is the reference's error. Cell VALUES
    * round-trip (typed via each column's parse — the reader's
    * inference rules); styles/formulas are not preserved, the
    * documented limit of the value-grain reader. */
  def append(bytes: Array[Byte], rows: Seq[Seq[Any]],
      sheet: Option[String] = None): Array[Byte] = {
    val sheets = parse(bytes)
    val names = sheets.map(_._1)
    val target = sheet match {
      case Some(s) =>
        if (!names.contains(s)) throw new IllegalArgumentException(
          s"Sheet '$s' not found. Available: ${names.mkString(", ")}")
        s
      case None => names.headOption.getOrElse(
        throw new IllegalArgumentException("workbook has no sheets"))
    }
    def typed(v: Option[String]): Any = v match {
      case None => null
      case Some(s0) =>
        if (scala.util.Try(s0.toLong).isSuccess) s0.toLong
        else if (scala.util.Try(s0.toDouble).isSuccess) s0.toDouble
        else if (s0 == "true") true
        else if (s0 == "false") false
        else s0
    }
    val rebuilt = sheets.map { case (name, rws) =>
      if (name != target) name -> rws.map(_.map(typed))
      else {
        if (rws.isEmpty || rws.head.forall(_.isEmpty))
          throw new IllegalArgumentException(
            "Excel file has no headers in the first row")
        name -> (rws.map(_.map(typed)) ++ rows)
      }
    }
    writeWorkbook(rebuilt)
  }

  /** `excel_sql` end to end over raw bytes: gate, register every
    * sheet (spaces/hyphens → underscores) plus the `data` alias for
    * the requested (default first) sheet, run (`excel_tool.py:
    * 564-617`). */
  def excelSql(spark: SparkSession, bytes: Array[Byte], sql: String,
      sheet: Option[String] = None): DataFrame = {
    val frames = sheetFrames(spark, bytes)
    val names = frames.map(_._1)
    val target = sheet match {
      case Some(s) =>
        if (!names.contains(s)) throw new IllegalArgumentException(
          s"Sheet '$s' not found. Available: ${names.mkString(", ")}")
        s
      case None => names.headOption.getOrElse(
        throw new IllegalArgumentException("workbook has no sheets"))
    }
    // gate BEFORE registration — a blocked query must not leave
    // views behind (sheetSql's contract, inlined because the `data`
    // alias must also exist before the query runs)
    if (!SqlGate.isSelectOnly(spark, sql))
      throw new SqlGate.BlockedSqlException(
        "Only SELECT queries are allowed for security reasons")
    frames.foreach { case (n, df) =>
      df.createOrReplaceTempView(n.replace(" ", "_").replace("-", "_"))
    }
    frames.find(_._1 == target).foreach { case (_, df) =>
      df.createOrReplaceTempView("data")
    }
    spark.sql(sql)
  }
}
