package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline: media as
  * opaque `binary` columns + typed metadata, processed per-partition.
  *
  * Three tiers, ALL real:
  *  - header-metadata extraction ([[sniffMetadata]]): PNG/JPEG/GIF/BMP
  *    geometry and WAV audio parameters parse directly from the
  *    container byte layout, no codec needed;
  *  - pixel/sample decode ([[extractFeatures]]): the JDK's built-in
  *    codecs — `javax.imageio.ImageIO` (PNG/JPEG/GIF/BMP readers ship
  *    with every JRE) for pixels, `javax.sound.sampled.AudioSystem`
  *    for WAV PCM — no external dependency; blobs no JDK codec reads
  *    degrade to deterministic byte-statistics features (kind
  *    `bytes`), never a crash;
  *  - Spark plumbing: the schema contract, the partition-wise batch
  *    processing shape (`mapPartitions` over rows, the Scala analog of
  *    `mapInPandas` batches: decoder state is amortized per partition,
  *    not per row), and the pruning-friendly layout (metadata columns
  *    separate from the blob so metadata-only queries never read
  *    bytes).
  */
object Multimodal {

  /** Media row contract: blob + metadata. Parquet stores the binary
    * column separately per row group, so `select(media_type, width)`
    * never touches bytes — the 100 TB design point. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("content", BinaryType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** Fallback features when no JDK codec accepts the blob: 8 byte
    * statistics. Deterministic, pure function of the bytes — keeps
    * unknown formats flowing through the pipeline instead of failing
    * the batch. */
  private def byteStatFeatures(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(8)(0f)
    val out = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      out(i % 8) += (bytes(i) & 0xff).toFloat / 255f
      i += 1
    }
    out.map(_ / bytes.length)
  }

  /** Pixel decode via `javax.imageio` (PNG/JPEG/GIF/BMP readers are
    * part of the JDK). Features, all in [0, 1]:
    * `[meanR, meanG, meanB, meanLuma, hist0, hist1, hist2, hist3]`
    * where luma = (0.299·R + 0.587·G + 0.114·B)/255 (ITU-R BT.601)
    * and hist_k is the share of pixels with luma byte in
    * [64k, 64(k+1)). Deterministic: `getRGB` yields sRGB ints, the
    * accumulation order is the fixed row-major pixel walk.
    * None = no registered reader accepted the bytes (caller falls
    * back to [[byteStatFeatures]]). */
  private[multimodal] def decodeImagePixels(
      bytes: Array[Byte]): Option[Array[Float]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Throwable => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
    var (sr, sg, sb, sl) = (0.0, 0.0, 0.0, 0.0)
    val hist = new Array[Long](4)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        val luma = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += luma
        hist(math.min(3, (luma / 64.0).toInt)) += 1
        x += 1
      }
      y += 1
    }
    val n = img.getWidth.toDouble * img.getHeight
    Some(Array(
      (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat,
      (sb / n / 255.0).toFloat, (sl / n / 255.0).toFloat,
      (hist(0) / n).toFloat, (hist(1) / n).toFloat,
      (hist(2) / n).toFloat, (hist(3) / n).toFloat))
  }

  /** PCM sample decode via `javax.sound.sampled` (the JDK's WAV
    * reader). Channels average to one mono sample per frame,
    * normalized to [-1, 1]. Features:
    * `[rms, peak, meanAbs, zeroCrossRate, (dc+1)/2, 0, 0, 0]`
    * (zero-cross rate = sign-change pairs / (frames-1); dc = mean
    * sample, shifted to [0, 1]). Only integer PCM up to 16-bit is
    * decoded — other encodings return None (fallback features). */
  private[multimodal] def decodeWavSamples(
      bytes: Array[Byte]): Option[Array[Float]] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Throwable => return None }
    try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      if ((enc != AudioFormat.Encoding.PCM_SIGNED &&
            enc != AudioFormat.Encoding.PCM_UNSIGNED) ||
          (bits != 8 && bits != 16) || ch < 1) return None
      val data = ais.readAllBytes()
      val frameBytes = (bits / 8) * ch
      val nFrames = data.length / frameBytes
      if (nFrames == 0) return None
      var (sumSq, sumAbs, sum) = (0.0, 0.0, 0.0)
      var peak = 0.0
      var crossings = 0L
      var prev = 0.0
      var f = 0
      while (f < nFrames) {
        var acc = 0.0
        var c = 0
        while (c < ch) {
          val off = f * frameBytes + c * (bits / 8)
          val v =
            if (bits == 8) {
              // 8-bit WAV is unsigned by spec; PCM_SIGNED honored too
              if (enc == AudioFormat.Encoding.PCM_UNSIGNED)
                ((data(off) & 0xff) - 128) / 128.0
              else data(off) / 128.0
            } else {
              // 16-bit little-endian
              val s = ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
              val raw =
                if (enc == AudioFormat.Encoding.PCM_UNSIGNED)
                  (s & 0xffff) - 32768
                else s.toInt
              raw / 32768.0
            }
          acc += v
          c += 1
        }
        val s = acc / ch
        sumSq += s * s; sumAbs += math.abs(s); sum += s
        if (math.abs(s) > peak) peak = math.abs(s)
        if (f > 0 && prev * s < 0) crossings += 1
        prev = s
        f += 1
      }
      val zcr = if (nFrames > 1) crossings.toDouble / (nFrames - 1) else 0.0
      Some(Array(
        math.sqrt(sumSq / nFrames).toFloat, peak.toFloat,
        (sumAbs / nFrames).toFloat, zcr.toFloat,
        ((sum / nFrames + 1.0) / 2.0).toFloat, 0f, 0f, 0f))
    } finally ais.close()
  }

  /** One decode: dispatch on the sniffed container format, JDK codec
    * first, byte-stat fallback. Returns (kind, features) where kind ∈
    * {image, audio, bytes}. */
  private[multimodal] def decode(
      bytes: Array[Byte]): (String, Array[Float]) = {
    if (bytes == null || bytes.isEmpty) return ("bytes", Array.fill(8)(0f))
    val fmt = sniff(bytes).getString(0)
    val decoded = fmt match {
      case "png" | "jpeg" | "gif" | "bmp" =>
        decodeImagePixels(bytes).map("image" -> _)
      case "wav" => decodeWavSamples(bytes).map("audio" -> _)
      case _ => None
    }
    decoded.getOrElse("bytes" -> byteStatFeatures(bytes))
  }

  private def checksum(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L // FNV-ish rolling hash over the blob
    var i = 0
    while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
    h
  }

  /** Feature extraction as a per-partition batch job: one decoder
    * "session" per partition (the expensive init a real decoder
    * needs), rows stream through it. The decode itself is REAL —
    * `ImageIO` pixels for PNG/JPEG/GIF/BMP, `AudioSystem` PCM samples
    * for WAV (both ship with the JDK); anything neither accepts flows
    * through as deterministic byte statistics with kind `bytes`. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions {
      rows =>
        // per-partition decoder init: ImageIO's disk-backed stream
        // cache would serialize every decode through temp files —
        // in-memory cache is the right call for executor batches
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes =
            if (r.isNullAt(1)) Array.empty[Byte]
            else r.getAs[Array[Byte]](1)
          val (kind, feats) = decode(bytes)
          Row(id, kind, bytes.length.toLong, checksum(bytes),
            feats.toSeq)
        }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  // ---------------------------------------------------------------
  // Header-metadata sniffing: container headers (PNG IHDR, JPEG SOF,
  // GIF/BMP geometry, WAV fmt/data chunks) are fixed byte layouts, so
  // dimensions / sample rates / durations come straight off the
  // blob's first bytes with no codec at all — cheaper than a decode
  // when only metadata is needed, and the dispatch key for
  // [[extractFeatures]]'s full decode.

  val sniffedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  private def beInt(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def beShort(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def leInt(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def leShort(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    b.length >= i + s.length &&
      s.indices.forall(k => (b(i + k) & 0xff) == s.charAt(k))

  /** Parsed header of one blob; all-null fields = unknown format or a
    * header too corrupt/truncated to trust. */
  private[multimodal] def sniff(b: Array[Byte]): Row = {
    def empty(fmt: String) = Row(fmt, null, null, null, null, null)
    if (b == null || b.length < 2) return empty(null)
    // PNG: 8-byte signature, IHDR width/height big-endian at 16/20 —
    // a recognized signature with a truncated header still reports
    // its format, with null geometry
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG")) {
      return if (b.length >= 24 && ascii(b, 12, "IHDR"))
        Row("png", beInt(b, 16), beInt(b, 20), null, null, null)
      else empty("png")
    }
    // GIF87a/GIF89a: logical screen size little-endian at 6/8
    if (ascii(b, 0, "GIF8")) {
      return if (b.length >= 10)
        Row("gif", leShort(b, 6), leShort(b, 8), null, null, null)
      else empty("gif")
    }
    // BMP: require a BITMAPINFOHEADER-family DIB (size >= 40 at 14) —
    // the OS/2 BITMAPCOREHEADER packs 16-bit geometry at different
    // offsets, and misreading it as int32 would emit garbage, worse
    // than the null degrade this contract promises. Height may be
    // negative = top-down rows; magnitude is the pixel height.
    if (ascii(b, 0, "BM")) {
      return if (b.length >= 26 && leInt(b, 14) >= 40)
        Row("bmp", leInt(b, 18), math.abs(leInt(b, 22)), null, null, null)
      else empty("bmp")
    }
    // JPEG: walk the marker stream to the first frame header (SOFn,
    // 0xC0-0xCF minus the non-frame C4/C8/CC): [len][prec][h:2][w:2].
    // T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    // marker code — consume them one at a time.
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xff) != 0xff) return empty("jpeg") // marker desync
        val m = b(i + 1) & 0xff
        if (m == 0xff) i += 1 // fill byte
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
            m != 0xcc)
          return Row("jpeg", beShort(b, i + 7), beShort(b, i + 5),
            null, null, null)
        else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9)) i += 2 // bare
        else i += 2 + beShort(b, i + 2) // skip payload
      }
      return empty("jpeg")
    }
    // WAV: RIFF/WAVE chunk walk; fmt -> channels/rate, data -> length;
    // duration = data bytes / byte-rate. Chunk sizes are UNSIGNED
    // 32-bit and the cursor runs in Long — a declared size near 2^32
    // (valid for >2 GiB data chunks, or crafted) must neither wrap an
    // Int index nor discard the already-parsed fmt fields; a chunk
    // running past the blob simply ends the walk.
    if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) {
      var i = 12L
      var (rate, ch, byteRate) = (0, 0, 0)
      var dataLen = -1L
      while (i + 8 <= b.length) {
        val ii = i.toInt
        val size = leInt(b, ii + 4).toLong & 0xffffffffL
        if (ascii(b, ii, "fmt ") && i + 24 <= b.length) {
          ch = leShort(b, ii + 10); rate = leInt(b, ii + 12)
          byteRate = leInt(b, ii + 16)
        } else if (ascii(b, ii, "data")) {
          dataLen = size
        }
        i += 8L + size + (size & 1L) // chunks are word-aligned
      }
      if (rate <= 0 || ch <= 0) return empty("wav")
      val dur = if (byteRate > 0 && dataLen >= 0)
        java.lang.Long.valueOf(dataLen * 1000L / byteRate) else null
      return Row("wav", null, null, rate, ch, dur)
    }
    empty(null)
  }

  /** Header metadata for every media row — the population step for
    * [[mediaSchema]]'s metadata columns. Same per-partition batch
    * shape as [[extractFeatures]]; reads only the blob's first bytes
    * per row, so at 100 TB the cost is dominated by the scan, and a
    * collector that stores blobs with a truncated `header` column can
    * run this on that column without touching content at all. */
  def sniffMetadata(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions {
      rows =>
        rows.map { r =>
          val bytes =
            if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val s = sniff(bytes)
          Row.fromSeq(r.getLong(0) +: s.toSeq)
        }
    }
    spark.createDataFrame(rdd, sniffedSchema)
  }

  /** Frame-sampling shape for time-media: pick every `stride`-th frame
    * index up to `durationMs` — pure metadata arithmetic, no decode;
    * the exploded (media_id, frame_idx) rows drive a later batched
    * decode. */
  /** Hard ceiling on frames per media row: far below both Spark's
    * sequence() array-length limit (~Int.MaxValue−15) and any sane
    * executor memory for an exploded frame list — 100M frames is ~39
    * days at 30 fps; anything above is corrupt metadata, and emitting
    * a capped (not aborted) list keeps the scan alive. */
  private val MaxFramesPerMedia = 100000000L

  def sampleFrameIndexes(media: DataFrame, fps: Int,
      stride: Int): DataFrame = {
    require(fps >= 1 && fps <= 1000, s"unreasonable fps: $fps")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    media
      // bound the duration before arithmetic: a corrupt value (e.g.
      // nanoseconds stored as ms) would overflow duration_ms * fps
      // under ANSI and abort the stage; ~10 years of ms is a generous
      // sanity ceiling for any real media. n_frames stays in LONG
      // integer math, capped at MaxFramesPerMedia (an Int.MaxValue-ish
      // cap would still exceed sequence()'s max array length and OOM
      // any executor materializing the exploded list).
      .filter(col("duration_ms").isNotNull &&
        col("duration_ms").between(0L, 315360000000L))
      .withColumn("n_frames",
        least(expr(s"(duration_ms * $fps) div 1000"),
          lit(MaxFramesPerMedia)).cast(IntegerType))
      // media too short for a single complete frame produces no rows
      // (an unguarded sequence(0, greatest(-1, 0)) would emit frame 0)
      .filter(col("n_frames") >= 1)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select("media_id", "frame_idx")
  }
}
