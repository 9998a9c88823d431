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

  /** Near-dup intake dedup at the d03 MinHash-BAND grain: a document
    * drops when ANY of its 4 band signatures (2 minhashes each, the
    * batch d03 construction bit-for-bit —
    * [[graft.queries.TextDedup.MhMix]] is the one shared definition
    * of the mixing constants, and the band key is the same
    * collision-free `m_even·(2³¹−1) + m_odd` long pairing d03's band
    * join uses) matches an earlier document within the watermark
    * horizon — the mutated-copy class (a few token edits) that slips
    * past [[nearDup]]'s single-fingerprint grain.
    *
    * Semantics: the stages chain, and each stage's state holds every
    * document that SURVIVED the stages before it — a superset of the
    * admitted corpus. A document can therefore drop through a chain:
    * Q drops at stage 2 against admitted X but leaves its band-0/1
    * keys behind, and a later R matching only Q's band 0 drops too.
    * That is the TRANSITIVE-cluster direction (batch d03 pairs + d07
    * components would put X, Q, R in one cluster and keep exactly one
    * of them), so the stream sits between plain kept-corpus matching
    * and the full d07 closure, keeping one first-arrival
    * representative per chain it sees in-horizon. State cost: between
    * 1 and 4 small rows per
    * in-horizon document that reached the respective stage — still
    * rate × horizon, never corpus.
    *
    * Texts too short to shingle fall back to exact content identity
    * per band (hash in the NEGATIVE key domain — band pairings are
    * non-negative, so the two can never collide). Batch frames replay
    * with global per-band dedup (the backfill contract, as
    * [[dropDups]]). */
  def nearDupBands(docs: DataFrame, watermark: String = "10 minutes",
      tsCol: String = "ts"): DataFrame = {
    val xs = expr( // x = gid % (2^31 − 1), the mhSigCte h-relation
      "transform(__gids, g -> g % 2147483647L)")
    val mins = graft.queries.TextDedup.MhMix.map { case (a, b) =>
      array_min(expr(s"transform(__xs, x -> ($a*x + $b) % 2147483647L)"))
    }
    // exact-content fallback for unshingleable texts: strictly
    // negative, disjoint from the non-negative band pairings. The
    // 63-bit mask (not abs) makes the negative-domain guarantee
    // unconditional: abs(Long.MinValue) is itself negative, so an
    // un-masked -abs(h)-1 would wrap to Long.MaxValue in that
    // 2^-64 case and collide with the band domain.
    val rawKey =
      -(xxhash64(col("text")).bitwiseAND(lit(Long.MaxValue))) - 1
    val withBands = (0 until 4).foldLeft(
      docs
        .withColumn("__gids", VectorExprs.shingleHash60(
          Fns.tokens(col("text")), distinct = false))
        .withColumn("__xs", xs)) { (df, bnd) =>
      df.withColumn(s"__band$bnd",
        coalesce(
          mins(2 * bnd) * lit(2147483647L) + mins(2 * bnd + 1),
          rawKey))
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
