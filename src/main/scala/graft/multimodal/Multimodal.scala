package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline: media as
  * opaque `binary` columns + typed metadata, processed per-partition.
  *
  * The decode step itself is STUBBED (no image/audio libraries in this
  * environment — `decodeStub` produces a deterministic fake feature
  * vector from the bytes). Everything Spark-side is real and tested:
  * the schema contract, the partition-wise batch processing shape
  * (`mapPartitions` over rows, the Scala analog of `mapInPandas`
  * batches: decoder state is amortized per partition, not per row),
  * and the pruning-friendly layout (metadata columns separate from the
  * blob so metadata-only queries never read bytes).
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
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** Deterministic stand-in for a real decoder: 8 "features" derived
    * from byte statistics. Replace with an actual decode (JNI/FFI or a
    * sidecar service) without touching the pipeline shape — ??? here
    * marks exactly the seam. */
  private def decodeStub(bytes: Array[Byte]): Array[Float] = {
    // real impl: ??? (image/audio decode; out of scope in this env)
    if (bytes == null || bytes.isEmpty) return Array.fill(8)(0f)
    val out = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      out(i % 8) += (bytes(i) & 0xff).toFloat / 255f
      i += 1
    }
    out.map(_ / bytes.length)
  }

  private def checksum(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L // FNV-ish rolling hash over the blob
    var i = 0
    while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
    h
  }

  /** Feature extraction as a per-partition batch job: one decoder
    * "session" per partition (the expensive init a real decoder needs),
    * rows stream through it. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions {
      rows =>
        // per-partition decoder init happens here (stub: nothing)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes =
            if (r.isNullAt(1)) Array.empty[Byte]
            else r.getAs[Array[Byte]](1)
          Row(id, bytes.length.toLong, checksum(bytes),
            decodeStub(bytes).toSeq)
        }
    }
    spark.createDataFrame(rdd, featureSchema)
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
