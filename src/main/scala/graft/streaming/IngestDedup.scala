package graft.streaming

import graft.functions.VectorExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming-ingest deduplication — the intake guard of a training-data
  * pipeline: documents arrive continuously (crawl shards, API dumps)
  * and exact / near duplicates should drop BEFORE they land in the
  * corpus, with state that does not grow forever.
  *
  * Both operators ride `dropDuplicatesWithinWatermark`: the state store
  * keys on the content fingerprint — one small hash per document inside
  * the watermark horizon, hash-partitioned across executors — and the
  * watermark bounds eviction, so state size is (ingest rate × horizon),
  * independent of total corpus size. That is the right contract for
  * intake dedup: the batch d-family ([[graft.queries.TextDedup]]) owns
  * corpus-wide retro-dedup; the stream only has to stop the torrent of
  * same-day repeats (mirrors, retries, double-submits) from ever being
  * written. Near-dups use the d05 winnowing grain (min shingle hash) —
  * the streaming twin of `d05_fingerprint_groups`.
  *
  * Input frames need `text` plus an event-time column (default `ts`).
  * The same calls work on batch frames for replay backfills — Spark
  * treats the watermark as a no-op there and dedups globally.
  */
object IngestDedup {

  /** Exact-content dedup on md5(text) within the watermark horizon. */
  def exact(docs: DataFrame, watermark: String = "10 minutes",
      tsCol: String = "ts"): DataFrame =
    docs.withColumn("fingerprint", md5(col("text")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Near-dup dedup at the winnowing-fingerprint grain (min 3-gram
    * shingle hash, as d05): light token reorderings and small suffix
    * edits that keep the minimal shingle collapse to one row. Texts
    * too short to shingle (<3 tokens) fall back to exact md5. */
  def nearDup(docs: DataFrame, watermark: String = "10 minutes",
      tsCol: String = "ts"): DataFrame =
    docs.withColumn("fingerprint",
        coalesce(
          array_min(VectorExprs.shingleHash60(
            split(col("text"), " "), distinct = false)).cast("string"),
          md5(col("text"))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
}
