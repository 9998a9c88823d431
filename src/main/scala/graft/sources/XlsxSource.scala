package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

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

  private def xml(bytes: Array[Byte]): Element = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature(
      "http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder()
      .parse(new ByteArrayInputStream(bytes)).getDocumentElement
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
                    .flatMap(i => shared.lift(i.toInt))
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
