package graft.streaming

import graft.functions.{Fns, VectorExprs}
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
  * The same calls accept batch frames for replay backfills — Spark
  * rejects `dropDuplicatesWithinWatermark` outside streaming, so the
  * batch path dedups globally on the same fingerprint (a backfill
  * wants the whole-input answer anyway).
  */
object IngestDedup {

  /** Horizon-bounded dedup on whatever `fingerprint` was derived. */
  private def dropDups(docs: DataFrame, watermark: String,
      tsCol: String): DataFrame =
    if (docs.isStreaming)
      docs.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark("fingerprint")
    else docs.dropDuplicates("fingerprint")

  /** Exact-content dedup on md5(text) within the watermark horizon. */
  def exact(docs: DataFrame, watermark: String = "10 minutes",
      tsCol: String = "ts"): DataFrame =
    dropDups(docs.withColumn("fingerprint", md5(col("text"))),
      watermark, tsCol)

  /** Near-dup dedup at the winnowing-fingerprint grain (min 3-gram
    * shingle hash, as d05): light token reorderings and small suffix
    * edits that keep the minimal shingle collapse to one row. Texts
    * too short to shingle (<3 tokens) fall back to exact md5.
    * Tokenization is [[Fns.tokens]] — the same pass the batch d-family
    * uses, so stream and batch grains cannot drift apart. */
  def nearDup(docs: DataFrame, watermark: String = "10 minutes",
      tsCol: String = "ts"): DataFrame =
    dropDups(
      docs.withColumn("fingerprint",
        coalesce(
          array_min(VectorExprs.shingleHash60(
            Fns.tokens(col("text")), distinct = false)).cast("string"),
          md5(col("text")))),
      watermark, tsCol)
}
