package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.plans.SqlGate
import graft.sources.XlsxSource
import org.apache.spark.sql.types._

/** The BINARY half of the excel tools (`excel_tool.py:564-612`,
  * openpyxl's job) against a hand-built SpreadsheetML container — the
  * same byte-exact fixture strategy as the multimodal codecs. */
class XlsxSourceSpec extends SparkTestBase {

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bout = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bout)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bout.toByteArray
  }

  // two sheets: "My Data" (mixed types, gaps, shared + inline
  // strings, booleans) and "Stats-2" (numeric, null header)
  private def fixture: Array[Byte] = zip(
    "xl/workbook.xml" ->
      """<?xml version="1.0"?>
        |<workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |  <sheets>
        |    <sheet name="My Data" sheetId="1" r:id="rId1"/>
        |    <sheet name="Stats-2" sheetId="2" r:id="rId2"/>
        |    <sheet name="Empty" sheetId="3" r:id="rId3"/>
        |  </sheets>
        |</workbook>""".stripMargin,
    "xl/_rels/workbook.xml.rels" ->
      """<?xml version="1.0"?>
        |<Relationships>
        |  <Relationship Id="rId1" Target="worksheets/sheet1.xml"/>
        |  <Relationship Id="rId2" Target="worksheets/sheet2.xml"/>
        |  <Relationship Id="rId3" Target="worksheets/sheet3.xml"/>
        |</Relationships>""".stripMargin,
    "xl/sharedStrings.xml" ->
      """<?xml version="1.0"?>
        |<sst><si><t>name</t></si><si><t>qty</t></si>
        |<si><t>ok</t></si><si><r><t>wid</t></r><r><t>get</t></r></si>
        |<si><t>bolt</t></si></sst>""".stripMargin,
    "xl/worksheets/sheet1.xml" ->
      """<?xml version="1.0"?>
        |<worksheet><sheetData>
        |<row r="1">
        |  <c r="A1" t="s"><v>0</v></c>
        |  <c r="B1" t="s"><v>1</v></c>
        |  <c r="C1" t="s"><v>2</v></c>
        |</row>
        |<row r="2">
        |  <c r="A2" t="s"><v>3</v></c>
        |  <c r="B2"><v>5</v></c>
        |  <c r="C2" t="b"><v>1</v></c>
        |</row>
        |<row r="3">
        |  <c r="A3" t="inlineStr"><is><t>nut</t></is></c>
        |  <c r="C3" t="b"><v>0</v></c>
        |</row>
        |<row r="4">
        |  <c r="A4" t="s"><v>4</v></c>
        |  <c r="B4"><v>12</v></c>
        |  <c r="C4" t="b"><v>1</v></c>
        |</row>
        |</sheetData></worksheet>""".stripMargin,
    "xl/worksheets/sheet2.xml" ->
      """<?xml version="1.0"?>
        |<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>v</t></is></c></row>
        |<row r="2"><c r="A2"><v>1.5</v></c><c r="B2"><v>9</v></c></row>
        |<row r="3"><c r="A3"><v>2.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin,
    "xl/worksheets/sheet3.xml" ->
      """<?xml version="1.0"?><worksheet><sheetData/></worksheet>""")

  test("parse: sheet order/names via rels, shared strings (rich-text " +
      "runs flattened), inline strings, booleans, missing cells as " +
      "None, ragged width") {
    val sheets = XlsxSource.parse(fixture)
    assert(sheets.map(_._1) === Seq("My Data", "Stats-2", "Empty"))
    val rows = sheets.head._2
    assert(rows.head === Seq(Some("name"), Some("qty"), Some("ok")))
    assert(rows(1) === Seq(Some("widget"), Some("5"), Some("true")))
    assert(rows(2) === Seq(Some("nut"), None, Some("false")))
    // sheet 2 row 2 is wider than its header row (B2 beyond A1)
    assert(sheets(1)._2(1) === Seq(Some("1.5"), Some("9")))
    assert(sheets(2)._2.isEmpty)
    assert(XlsxSource.colIndex("A1") === 0)
    assert(XlsxSource.colIndex("AB7") === 27)
  }

  test("sheetFrames: first row = headers (None -> Column_i), " +
      "deterministic column typing, empty sheets skipped " +
      "(excel_tool.py:585-612)") {
    val frames = XlsxSource.sheetFrames(spark, fixture)
    assert(frames.map(_._1) === Seq("My Data", "Stats-2")) // Empty gone
    val d = frames.head._2
    assert(d.schema === StructType(Seq(
      StructField("name", StringType),
      StructField("qty", LongType),
      StructField("ok", BooleanType))))
    val got = d.collect().map(r =>
      (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(got === Seq(
      ("widget", Some(5L), Some(true)),
      ("nut", None, Some(false)),
      ("bolt", Some(12L), Some(true))))
    // Stats-2: doubles; the headerless B column names Column_2
    val s = frames(1)._2
    assert(s.schema.fieldNames.toSeq === Seq("v", "Column_2"))
    assert(s.schema.fields.map(_.dataType).toSeq ===
      Seq(DoubleType, LongType))
  }

  test("excelSql: per-sheet tables (spaces/hyphens -> underscores), " +
      "data alias on the requested/first sheet, SELECT-only gate " +
      "before registration (excel_tool.py:564-617)") {
    val total = XlsxSource.excelSql(spark, fixture,
      "SELECT SUM(qty) AS s FROM My_Data WHERE ok").head().getLong(0)
    assert(total === 17L)
    // data alias = first sheet by default
    val viaData = XlsxSource.excelSql(spark, fixture,
      "SELECT COUNT(*) AS c FROM data").head().getLong(0)
    assert(viaData === 3L)
    // ...and the named sheet when requested (hyphen-sanitized table
    // name also resolvable)
    val stats = XlsxSource.excelSql(spark, fixture,
      "SELECT SUM(v) AS s FROM data", sheet = Some("Stats-2"))
      .head().getDouble(0)
    assert(stats === 4.0)
    intercept[IllegalArgumentException](XlsxSource.excelSql(
      spark, fixture, "SELECT 1", sheet = Some("Nope")))
    intercept[SqlGate.BlockedSqlException](XlsxSource.excelSql(
      spark, fixture, "DROP TABLE My_Data"))
    intercept[IllegalArgumentException](
      XlsxSource.parse("not a zip".getBytes))
  }

  test("info: per-sheet columns/row counts (header excluded) + file " +
      "size (excel_tool.py:333-408)") {
    val out = XlsxSource.info(spark, fixture).collect()
      .map(r => r.getString(0) ->
        ((r.getSeq[String](1).toSeq, r.getLong(2), r.getLong(3)))).toMap
    assert(out("My Data") === ((Seq("name", "qty", "ok"), 3L, 3L)))
    // rows pad to the sheet's width (openpyxl's read-only dimension
    // behavior), so the headerless B column reports as Column_2 —
    // consistent with sheetFrames
    assert(out("Stats-2") === ((Seq("v", "Column_2"), 2L, 2L)))
    assert(out("Empty") === ((Seq.empty[String], 0L, 0L)))
  }

  test("write/append: excel_write emits a valid container that " +
      "round-trips through the reader with types intact; " +
      "excel_append adds rows after the last and rejects headerless " +
      "sheets (excel_tool.py:148-330)") {
    val written = XlsxSource.write(
      columns = Seq("item", "n", "live"),
      rows = Seq(
        Seq("a<b&c", 3L, true),  // XML-escaping exercised
        Seq("plain", 1.5, false),
        Seq(null, 7L, true)))
    // round-trip through our own reader
    val frames = XlsxSource.sheetFrames(spark, written)
    assert(frames.map(_._1) === Seq("Sheet1"))
    val d = frames.head._2
    assert(d.schema.fieldNames.toSeq === Seq("item", "n", "live"))
    // n column mixes 3 and 1.5 -> DOUBLE (the reader's inference)
    assert(d.schema("n").dataType === DoubleType)
    assert(d.schema("live").dataType === BooleanType)
    val got = d.collect().map(r =>
      (Option(r.get(0)), r.getDouble(1), r.getBoolean(2))).toSeq
    assert(got === Seq(
      (Some("a<b&c"), 3.0, true),
      (Some("plain"), 1.5, false),
      (None, 7.0, true)))
    // append to the fixture's first sheet, then query the result
    val appended = XlsxSource.append(fixture,
      Seq(Seq("screw", 4L, true)))
    val total = XlsxSource.excelSql(spark, appended,
      "SELECT SUM(qty) AS s FROM My_Data WHERE ok").head().getLong(0)
    assert(total === 21L) // 5 + 12 + 4
    // other sheets survive the rewrite
    assert(XlsxSource.parse(appended).map(_._1) ===
      Seq("My Data", "Stats-2", "Empty"))
    // headerless target -> the reference's error
    val headerless = XlsxSource.writeWorkbook(
      Seq("S" -> Seq(Seq(null, null))))
    intercept[IllegalArgumentException](
      XlsxSource.append(headerless, Seq(Seq("x"))))
    intercept[IllegalArgumentException](
      XlsxSource.append(written, Seq(Seq("x")), sheet = Some("Nope")))
  }

  test("fuzz: random bytes, truncated containers, and byte-flipped " +
      "valid workbooks either parse or raise IllegalArgumentException " +
      "— never an uncontrolled error (tolerance contract)") {
    val rnd = new scala.util.Random(53)
    val valid = fixture
    def tryParse(b: Array[Byte]): Unit =
      try { XlsxSource.parse(b); () }
      catch { case _: IllegalArgumentException => () }
    (0 until 120).foreach { i =>
      tryParse(Array.fill(rnd.nextInt(400))(rnd.nextInt.toByte))
      tryParse(java.util.Arrays.copyOf(valid,
        rnd.nextInt(valid.length)))
      val flipped = valid.clone()
      flipped(rnd.nextInt(flipped.length)) =
        (flipped(rnd.nextInt(flipped.length)) ^ 0xff).toByte
      tryParse(flipped)
    }
    // PDF text extractor: the same contract, all-null degrade instead
    // of an exception (per-row media tier — a bad blob must not kill
    // the scan)
    val pdfValid = ("%PDF-1.4\n1 0 obj\n<< /Length 20 >>\nstream\n" +
      "BT (x) Tj ET\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    (0 until 120).foreach { i =>
      graft.multimodal.Multimodal.pdfText(
        Array.fill(rnd.nextInt(300))(rnd.nextInt.toByte))
      graft.multimodal.Multimodal.pdfText(
        java.util.Arrays.copyOf(pdfValid, rnd.nextInt(pdfValid.length)))
      val flipped = pdfValid.clone()
      flipped(rnd.nextInt(flipped.length)) =
        (flipped(rnd.nextInt(flipped.length)) ^ 0xff).toByte
      graft.multimodal.Multimodal.pdfText(flipped)
    }
  }
}
