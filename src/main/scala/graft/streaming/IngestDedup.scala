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

  // d03's exact minhash mixing (TextDedup mhSigCte): 8 fixed
  // multipliers mod 2^31−1 over the raw shingle hashes, 4 bands of 2
  // rows — ONE definition of the constants would be circular here
  // (TextDedup composes SQL text); the spec asserts the two stay
  // band-compatible instead.
  private val MhMix: Seq[(Long, Long)] = Seq(
    1000000007L -> 12345L, 998244353L -> 54321L,
    754974721L -> 88883L, 469762049L -> 13577L,
    167772161L -> 97531L, 1224736769L -> 24680L,
    1051721729L -> 86420L, 1107296257L -> 11111L)

  /** Near-dup intake dedup at the d03 MinHash-BAND grain: a document
    * drops when ANY of its 4 band signatures (2 minhashes each, the
    * batch d03 construction bit-for-bit) was already ADMITTED within
    * the watermark horizon — the mutated-copy class (a few token
    * edits) that slips past [[nearDup]]'s single-fingerprint grain.
    *
    * Semantics note: the stages chain, so state holds only ADMITTED
    * documents' signatures — the contract is dedup against the KEPT
    * corpus (a transitive chain through an already-dropped doc is not
    * consulted; batch d03+d07 owns transitive clustering). Texts too
    * short to shingle fall back to exact md5 per band. Batch frames
    * replay with global per-band dedup (the backfill contract, as
    * [[dropDups]]). State cost: 4 small rows per admitted doc inside
    * the horizon — still rate × horizon, never corpus. */
  def nearDupBands(docs: DataFrame, watermark: String = "10 minutes",
      tsCol: String = "ts"): DataFrame = {
    val xs = expr( // x = gid % (2^31 − 1), the mhSigCte h-relation
      "transform(__gids, g -> g % 2147483647L)")
    val mins = MhMix.map { case (a, b) =>
      array_min(expr(s"transform(__xs, x -> ($a*x + $b) % 2147483647L)"))
    }
    val withBands = (0 until 4).foldLeft(
      docs
        .withColumn("__gids", VectorExprs.shingleHash60(
          Fns.tokens(col("text")), distinct = false))
        .withColumn("__xs", xs)) { (df, bnd) =>
      df.withColumn(s"__band$bnd",
        coalesce(
          concat(mins(2 * bnd).cast("string"), lit(":"),
            mins(2 * bnd + 1).cast("string")),
          concat(lit("raw:"), md5(col("text")))))
    }.drop("__gids", "__xs")
    val deduped = (0 until 4).foldLeft(
      if (withBands.isStreaming) withBands.withWatermark(tsCol, watermark)
      else withBands) { (df, bnd) =>
      if (df.isStreaming) df.dropDuplicatesWithinWatermark(s"__band$bnd")
      else df.dropDuplicates(s"__band$bnd")
    }
    deduped.drop((0 until 4).map(b => s"__band$b"): _*)
  }
}
