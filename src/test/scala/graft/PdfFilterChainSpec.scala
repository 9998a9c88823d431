package graft

import java.io.ByteArrayOutputStream

import graft.multimodal.Multimodal

/** Round-11: the full PDF /Filter transport chain (PDF 32000-1 §7.4).
  * ASCIIHexDecode, ASCII85Decode and RunLengthDecode join Flate/LZW,
  * filters CASCADE in declared order, and the §7.4.4.4 predictors
  * (TIFF 2, PNG 10-15 — standard on xref/object streams and many
  * producers' image rasters) reverse after Flate/LZW. Fixtures are
  * built by real encoders written against the spec text, so every
  * decode under test round-trips actual filter bytes. */
class PdfFilterChainSpec extends SparkTestBase {

  // --- fixture encoders (spec-text implementations) -----------------

  private def hexEncode(data: Array[Byte]): Array[Byte] =
    (data.map(b => f"${b & 0xff}%02X").mkString(" ") + ">")
      .getBytes("ISO-8859-1")

  private def a85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i + 4 <= data.length) {
      var v = 0L
      for (k <- 0 until 4) v = (v << 8) | (data(i + k) & 0xffL)
      val cs = new Array[Char](5)
      for (k <- 4 to 0 by -1) { cs(k) = ('!' + (v % 85).toInt).toChar; v /= 85 }
      sb.appendAll(cs)
      i += 4
    }
    val rem = data.length - i
    if (rem > 0) {
      var v = 0L
      for (k <- 0 until 4)
        v = (v << 8) | (if (i + k < data.length) data(i + k) & 0xffL else 0L)
      val cs = new Array[Char](5)
      for (k <- 4 to 0 by -1) { cs(k) = ('!' + (v % 85).toInt).toChar; v /= 85 }
      sb.appendAll(cs.take(rem + 1))
    }
    (sb.toString + "~>").getBytes("ISO-8859-1")
  }

  private def rleEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && run < 128 &&
          data(i + run) == data(i)) run += 1
      if (run >= 2) {
        out.write(257 - run); out.write(data(i)); i += run
      } else {
        var lit = 1
        while (i + lit < data.length && lit < 128 &&
            (i + lit + 1 >= data.length || data(i + lit) != data(i + lit + 1)))
          lit += 1
        out.write(lit - 1); out.write(data, i, lit); i += lit
      }
    }
    out.write(128) // EOD
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  /** PNG-filter rows of `raw` (rowBytes-wide), filter type cycling
    * 0..4 per row so None/Sub/Up/Average/Paeth all appear. Filtering
    * reads ORIGINAL bytes of this and the prior row (PNG spec). */
  private def pngFilter(raw: Array[Byte], rowBytes: Int,
      bpp: Int): Array[Byte] = {
    val rows = raw.length / rowBytes
    val out = new ByteArrayOutputStream()
    for (r <- 0 until rows) {
      val ft = r % 5
      out.write(ft)
      for (x <- 0 until rowBytes) {
        val cur = raw(r * rowBytes + x) & 0xff
        val left = if (x >= bpp) raw(r * rowBytes + x - bpp) & 0xff else 0
        val up = if (r > 0) raw((r - 1) * rowBytes + x) & 0xff else 0
        val ul = if (r > 0 && x >= bpp)
          raw((r - 1) * rowBytes + x - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        out.write((cur - pred) & 0xff)
      }
    }
    out.toByteArray
  }

  private def tiffFilter(raw: Array[Byte], rowBytes: Int,
      colors: Int): Array[Byte] = {
    val out = raw.clone()
    var r = 0
    while ((r + 1) * rowBytes <= out.length) {
      // difference right-to-left so each sample subtracts the ORIGINAL
      // left neighbor
      var i = (r + 1) * rowBytes - 1
      while (i >= r * rowBytes + colors) {
        out(i) = ((raw(i) & 0xff) - (raw(i - colors) & 0xff)).toByte
        i -= 1
      }
      r += 1
    }
    out
  }

  /** Minimal PDF embedding (dict, body) stream objects as 4..N. */
  private def pdf(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    ascii("%PDF-1.5\n")
    ascii("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    ascii("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    ascii("3 0 obj << /Type /Page /Parent 2 0 R >> endobj\n")
    streams.zipWithIndex.foreach { case ((dict, body), i) =>
      ascii(s"${4 + i} 0 obj << $dict /Length ${body.length} >> stream\n")
      out.write(body)
      ascii("\nendstream endobj\n")
    }
    ascii("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  private val sample =
    "BT /F1 12 Tf (Chained) Tj ET".getBytes("ISO-8859-1")

  // --- decoder units ------------------------------------------------

  test("ASCIIHexDecode: whitespace ignored, > is EOD, odd trailing " +
      "digit pads a zero low nibble, non-hex bytes are malformed") {
    assert(Multimodal.asciiHexDecode(hexEncode(sample)).get.toSeq ===
      sample.toSeq)
    assert(Multimodal.asciiHexDecode("48 65 6C 6C 6F>".getBytes).get
      .toSeq === "Hello".getBytes.toSeq)
    // odd digit: <7> means 0x70
    assert(Multimodal.asciiHexDecode("7>".getBytes).get.toSeq ===
      Seq(0x70.toByte))
    // data past EOD ignored; garbage inside is malformed
    assert(Multimodal.asciiHexDecode("41> zz".getBytes).get.toSeq ===
      Seq('A'.toByte))
    assert(Multimodal.asciiHexDecode("4g>".getBytes).isEmpty)
  }

  test("ASCII85Decode: 5→4 groups, z zero-group shortcut, partial " +
      "tails of 2/3/4 chars yield 1/2/3 bytes, ~> is EOD, a group " +
      "above 2^32 and a 1-char tail are malformed") {
    for (n <- 1 to 9) {
      val data = sample.take(n)
      assert(Multimodal.ascii85Decode(a85Encode(data)).get.toSeq ===
        data.toSeq, s"tail n=$n")
    }
    // 'z' encodes four zero bytes ('!!!!!' spelled out also works)
    assert(Multimodal.ascii85Decode("z~>".getBytes).get.toSeq ===
      Seq[Byte](0, 0, 0, 0))
    assert(Multimodal.ascii85Decode("!!!!!~>".getBytes).get.toSeq ===
      Seq[Byte](0, 0, 0, 0))
    // whitespace anywhere between chars
    val ws = a85Encode(sample).flatMap(b => Seq(b, '\n'.toByte))
    assert(Multimodal.ascii85Decode(ws).get.toSeq === sample.toSeq)
    // 's8W-!' is exactly 2^32-1 (the max valid group); 'uuuuu'
    // overflows; a lone tail char encodes nothing
    assert(Multimodal.ascii85Decode("s8W-!~>".getBytes).get.toSeq ===
      Seq[Byte](-1, -1, -1, -1))
    assert(Multimodal.ascii85Decode("uuuuu~>".getBytes).isEmpty)
    assert(Multimodal.ascii85Decode("!~>".getBytes).isEmpty)
  }

  test("RunLengthDecode: literal and repeat runs, 128 is EOD, " +
      "truncation mid-run is malformed; spec encoder round-trips " +
      "mixed content") {
    val mixed = ("aaaaaaabcdefg" + "x" * 200 + "tail").getBytes
    assert(Multimodal.runLengthDecode(rleEncode(mixed)).get.toSeq ===
      mixed.toSeq)
    // 257-129 = 128 copies of 'Q'
    assert(Multimodal.runLengthDecode(
      Array(129.toByte, 'Q'.toByte, 128.toByte)).get.length === 128)
    // literal header promising 4 bytes with 2 present
    assert(Multimodal.runLengthDecode(
      Array[Byte](3, 'a', 'b')).isEmpty)
  }

  test("predictors: PNG 10-15 reverse per-row None/Sub/Up/Average/" +
      "Paeth filters; TIFF 2 reverses horizontal differencing; " +
      "undefined values degrade to None") {
    val rng = new scala.util.Random(7)
    val w = 24; val h = 10; val bpp = 3
    val raw = Array.fill((w * bpp) * h)(rng.nextInt(256).toByte)
    val parms = s"/Predictor 12 /Colors 3 /BitsPerComponent 8 /Columns $w"
    assert(Multimodal.applyPredictor(
      pngFilter(raw, w * bpp, bpp), parms).get.toSeq === raw.toSeq)
    val grayRaw = Array.fill(8 * 8)(rng.nextInt(256).toByte)
    assert(Multimodal.applyPredictor(
      tiffFilter(grayRaw, 8, 1),
      "/Predictor 2 /Columns 8").get.toSeq === grayRaw.toSeq)
    // predictor 1 / no predictor = identity; 3..9 undefined
    assert(Multimodal.applyPredictor(raw, "").get.toSeq === raw.toSeq)
    assert(Multimodal.applyPredictor(raw, "/Predictor 5").isEmpty)
  }

  test("parseFilters: name and array forms in order, inline-image " +
      "abbreviations normalize, DecodeParms pairs by position with " +
      "null placeholders") {
    assert(Multimodal.parseFilters("<< /Length 9 >>") === Seq.empty)
    assert(Multimodal.parseFilters("<< /Filter /FlateDecode >>") ===
      Seq("FlateDecode" -> ""))
    assert(Multimodal.parseFilters(
      "<< /Filter [ /A85 /Fl ] >>").map(_._1) ===
      Seq("ASCII85Decode", "FlateDecode"))
    val paired = Multimodal.parseFilters(
      "<< /Filter [ /ASCII85Decode /FlateDecode ] " +
        "/DecodeParms [ null << /Predictor 12 /Columns 5 >> ] >>")
    assert(paired.map(_._1) === Seq("ASCII85Decode", "FlateDecode"))
    assert(paired(0)._2 === "")
    assert(paired(1)._2.contains("/Predictor 12"))
    val single = Multimodal.parseFilters(
      "<< /Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns 4 >> >>")
    assert(single.head._2.contains("/Predictor 2"))
  }

  // --- end-to-end through the text and image tiers ------------------

  test("pdfText: ASCIIHex, RunLength and [ASCII85 + Flate] chained " +
      "content streams all extract; an unsupported chain stage " +
      "contributes nothing, never a crash") {
    val doc = pdf(Seq(
      ("/Filter /ASCIIHexDecode", hexEncode(sample)),
      ("/Filter /RunLengthDecode", rleEncode(sample)),
      ("/Filter [ /ASCII85Decode /FlateDecode ]",
        a85Encode(deflate(sample))),
      ("/Filter [ /ASCII85Decode /JBIG2Decode ]",
        a85Encode("BT (never) Tj ET".getBytes))))
    val r = Multimodal.pdfText(doc)
    assert(r.getLong(1) === 3L) // three decodable content streams
    val content = r.getString(2)
    assert(content.split("\n\n").count(_.contains("Chained")) === 3)
    assert(!content.contains("never"))
  }

  test("pdfImageObjects: a Flate raster behind PNG predictor 12 " +
      "DecodeParms rebuilds bit-equal; DCT behind an ASCII85 " +
      "transport prefix decodes; TIFF predictor 2 gray rebuilds; " +
      "an unsupported chain yields no row") {
    val rng = new scala.util.Random(11)
    val w = 24; val h = 16
    val raw = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
    val png = deflate(pngFilter(raw, w * 3, 3))
    val grayRaw = Array.fill(8 * 8)(rng.nextInt(256).toByte)
    val gray = deflate(tiffFilter(grayRaw, 8, 1))
    // a JPEG for the DCT-behind-transport case
    val card = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      card.setRGB(x, y, ((x * 16) << 16) | ((y * 16) << 8) | 128)
    val jout = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(card, "jpg", jout))
    val doc = pdf(Seq(
      ("/Subtype /Image /Filter /FlateDecode /Width 24 /Height 16 " +
        "/BitsPerComponent 8 /ColorSpace /DeviceRGB /DecodeParms " +
        "<< /Predictor 12 /Colors 3 /BitsPerComponent 8 /Columns 24 >>",
        png),
      ("/Subtype /Image /Filter [ /ASCII85Decode /DCTDecode ] " +
        "/Width 16 /Height 16 /BitsPerComponent 8 /ColorSpace /DeviceRGB",
        a85Encode(jout.toByteArray)),
      ("/Subtype /Image /Filter /FlateDecode /Width 8 /Height 8 " +
        "/BitsPerComponent 8 /ColorSpace /DeviceGray /DecodeParms " +
        "<< /Predictor 2 /Columns 8 >>", gray),
      ("/Subtype /Image /Filter [ /ASCII85Decode /JPXDecode ] " +
        "/Width 4 /Height 4 /BitsPerComponent 8 /ColorSpace /DeviceRGB",
        a85Encode(Array.fill(48)(0.toByte)))))
    val imgs = Multimodal.pdfImageObjects(doc)
    assert(imgs.map(_._1) === Seq(4, 5, 6)) // JPX row absent
    val predicted = imgs.head._3
    assert(imgs.head._2 === "flate-raster")
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      val want = ((raw(p) & 0xff) << 16) | ((raw(p + 1) & 0xff) << 8) |
        (raw(p + 2) & 0xff)
      assert((predicted.getRGB(x, y) & 0xffffff) === want,
        s"pixel ($x,$y)")
    }
    assert(imgs(1)._2 === "dct" && imgs(1)._3.getWidth === 16)
    val grayImg = imgs(2)._3
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = grayRaw(y * 8 + x) & 0xff
      assert((grayImg.getRGB(x, y) & 0xff) === v, s"gray ($x,$y)")
    }
  }

  test("property: 80 seeded random transport chains (depth 1-3 over " +
      "Hex/A85/RLE/Flate on random binary payloads) round-trip " +
      "through decodeChain in declared order") {
    val rng = new scala.util.Random(20260817)
    val names = Vector("/ASCIIHexDecode", "/ASCII85Decode",
      "/RunLengthDecode", "/FlateDecode")
    for (it <- 0 until 80) {
      val data = Array.fill(1 + rng.nextInt(900))(rng.nextInt(256).toByte)
      val chain = Seq.fill(1 + rng.nextInt(3))(rng.nextInt(4))
      // the dict lists decode order; encoding applies it reversed
      val body = chain.reverse.foldLeft(data) { (cur, f) =>
        f match {
          case 0 => hexEncode(cur)
          case 1 => a85Encode(cur)
          case 2 => rleEncode(cur)
          case _ => deflate(cur)
        }
      }
      val dict =
        if (chain.length == 1) s"<< /Filter ${names(chain.head)} >>"
        else s"<< /Filter [ ${chain.map(names).mkString(" ")} ] >>"
      val got = Multimodal.decodeChain(dict, body, 0, body.length)
      assert(got.isDefined, s"iter $it chain $chain")
      assert(got.get.toSeq === data.toSeq, s"iter $it chain $chain")
    }
  }

  test("sniffPdf: an ObjStm behind [ASCIIHex + Flate] still counts " +
      "its packed objects and pages (the metadata tier shares the " +
      "chain decoder)") {
    val inner = "10 0 20 40 << /Type /Page >> << /Type /Page >>"
      .getBytes("ISO-8859-1")
    val doc = pdf(Seq(
      ("/Type /ObjStm /N 2 /First 10 " +
        "/Filter [ /ASCIIHexDecode /FlateDecode ]",
        hexEncode(deflate(inner)))))
    val r = Multimodal.sniffPdf(doc)
    // 1 catalog + 1 pages + 1 explicit page node + the stream obj
    // itself + 2 packed objects; pages: 1 explicit + 2 packed
    assert(r.getLong(2) === 6L)
    assert(r.getLong(1) === 3L)
  }
}
