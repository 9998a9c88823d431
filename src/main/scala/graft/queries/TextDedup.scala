package graft.queries

import graft.{Q, Tables}
import graft.operators.{GraphOps, Pin}
import graft.functions.{Fns, VectorExprs}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication over the `documents` table — the training-data-pipeline
  * operators layered on the reference's query surface (BASELINE.json
  * north star; no native equivalent in the reference — closest shapes
  * are the set/difference ops of SURVEY §2.7).
  *
  * Scale design: every pair-producing operator generates candidates via
  * an equi-join (inverted index, LSH band, or pigeonhole piece) — never
  * a cross join — so the shuffle keys are content-derived and the plan
  * survives 1000× growth. Exact hashing is cross-engine deterministic
  * (see [[graft.functions.Fns]]).
  */
object TextDedup {

  /** doc_id + tokens, with the token array materialized in its own
    * projection: the shingle lambda below is a higher-order function
    * (CodegenFallback, no subexpression elimination), so an inlined
    * `split(text)` would re-tokenize the document for every element_at
    * — measured 14× slower at sf0.1. */
  private def tokenized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), Fns.tokens(col("text")).as("ws"))

  /** doc_id + 60-bit md5-prefix hash per word-3-gram shingle, docs
    * with ≥3 tokens — the whole shingle→hash pipeline as ONE native
    * pass per document ([[graft.functions.Shingle3Hash60]]); the gram
    * strings never materialize as rows. `distinct` dedups hashes per
    * doc (the post-hash twin of `list_distinct`; MIN-aggregating
    * consumers skip it — duplicate-insensitive). */
  private[queries] def gids(s: SparkSession, dir: String,
      distinct: Boolean): DataFrame =
    tokenized(s, dir)
      .select(col("doc_id"),
        explode(VectorExprs.shingleHash60(col("ws"), distinct)).as("gid"))

  /** Oracle twin of [[gids]](distinct = true): hash first, dedup the
    * hashes — identical to Spark's order so any 60-bit collision
    * collapses on both engines. */
  private[queries] val gidsCte =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |g AS (SELECT doc_id,
      |        unnest(list_distinct(
      |          [('0x'||substr(md5(ws[i]||' '||ws[i+1]||' '||ws[i+2]),1,15))::BIGINT
      |           FOR i IN range(1, len(ws)-1)])) AS gid
      |      FROM t WHERE len(ws) >= 3)""".stripMargin

  /** Oracle twin of [[gids]](distinct = false). */
  private[queries] val gidsRawCte =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |g AS (SELECT doc_id,
      |        unnest([('0x'||substr(md5(ws[i]||' '||ws[i+1]||' '||ws[i+2]),1,15))::BIGINT
      |                FOR i IN range(1, len(ws)-1)]) AS gid
      |      FROM t WHERE len(ws) >= 3)""".stripMargin

  /** Hub-shingle document-frequency cap, derived from the OBSERVED df
    * distribution (VERDICT r5 ask #3 — a fixed cap lets a corpus 10×
    * denser than expected blow quadratically past it silently):
    *
    *   cap = LEAST(MaxDfCap, GREATEST(MinDfCap,
    *           largest df value c such that Σ_{df ≤ c} df² ≤
    *             PairBudget · |gram occurrences|))
    *
    * Σ df² over kept grams bounds the candidate-pair volume of the
    * inverted-index self-join, so the budget makes pair generation
    * LINEAR in corpus size by construction — the 100 TB property a
    * constant can't give. [[MinDfCap]] keeps ordinary corpora intact
    * (a df-64 gram contributes ≤ 2016 pairs — noise), and on the
    * whole test corpus max df ≤ 25, so the floor reproduces the old
    * fixed-cap behavior bit-for-bit there. [[MaxDfCap]] preserves the
    * absolute hub guard the fixed cap provided. ONE definition,
    * interpolated into every oracle string AND computed by the same
    * integer arithmetic in every Spark plan that uses it (d02, s06,
    * d09): the ground truth and its evaluators can never disagree on
    * which grams were dropped. Exactness: the cumulative Σ df² runs
    * in HUGEINT on DuckDB and decimal(38,0) on Spark — both exact
    * 128-bit, so the boundary comparison is bit-identical. */
  private[queries] val MinDfCap = 64L
  private[queries] val MaxDfCap = 1000L
  private[queries] val PairBudget = 256L
  private[queries] val JaccardMin = 0.5

  /** Oracle twin of the auto-cap: a scalar subquery over the gram
    * relation `g` (pass the CTE name), usable inside `HAVING
    * COUNT(*) > ...`. The df histogram is grouped BY df value first,
    * so the window runs over at most |distinct df values| rows. */
  private[queries] def capSql(g: String): String =
    s"""(SELECT LEAST($MaxDfCap, GREATEST($MinDfCap, COALESCE(MAX(df), 0)))
       | FROM (SELECT df, SUM(df::HUGEINT * df * k) OVER (ORDER BY df) AS cum
       |       FROM (SELECT df, COUNT(*) AS k
       |             FROM (SELECT gid, COUNT(*) AS df FROM $g GROUP BY gid)
       |             GROUP BY df))
       | WHERE cum <= $PairBudget * (SELECT COUNT(*) FROM $g))""".stripMargin
      .replace("\n", " ")

  /** The auto-cap as a 1-row `(cap)` DataFrame over a distinct
    * `(doc_id, gid)` relation — same arithmetic as [[capSql]].
    * Scale shape: df agg runs on the gid-partitioned pin
    * (exchange-free), the histogram collapses to df-VALUE grain
    * before the global-order window, so the single-task window sees
    * at most |distinct df values| rows — bounded by max df, not by
    * corpus size. */
  private[queries] def autoDfCap(g: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    val dfs = g.groupBy("gid").agg(count(lit(1)).as("df"))
    val hist = dfs.groupBy("df").agg(count(lit(1)).as("k"))
    val cum = hist.select(col("df"),
      sum(col("df").cast(dec) * col("df").cast(dec) * col("k").cast(dec))
        .over(Window.orderBy("df")).as("cum"))
    val tot = g.agg(count(lit(1)).cast(dec).as("t"))
    cum.crossJoin(broadcast(tot))
      .filter(col("cum") <= lit(PairBudget).cast(dec) * col("t"))
      .agg(coalesce(max("df"), lit(0L)).as("rawcap"))
      .select(least(lit(MaxDfCap),
        greatest(lit(MinDfCap), col("rawcap"))).as("cap"))
  }

  /** The pinned, df-capped, gid-PRE-PARTITIONED distinct-gram relation
    * `(doc_id, gid)` shared by d02 and s06 (ONE definition → identical
    * plans → the persist cache manager dedups, so in a long-lived
    * session both queries read the same blocks).
    *
    * Pre-partitioning by gid before the pin is the load-bearing part:
    * every downstream consumer either aggregates on gid (the hot-list)
    * or joins on gid (d02's self-join, s06's eval⋈train join), and the
    * cached blocks carry `HashPartitioning(gid)` through the cache —
    * the joins and the hot-list agg all run exchange-free. That is the
    * 100 TB co-location strategy (partition the inverted index by its
    * join key ONCE, reuse it across every dedup pass) and at sf0.1 it
    * removes three exchanges from the steady-state path.
    *
    * The hub-gram (df > [[autoDfCap]]) anti-join runs BEFORE the
    * second pin: the hot list is tiny at any scale (it is the skew,
    * by definition) → broadcast anti-join, which preserves the
    * streamed side's gid partitioning. The cap itself is a 1-row
    * broadcast (the t10 corpus-total pattern) — deriving it adds
    * df-histogram-grain work only, never a corpus-grain pass beyond
    * the df agg the hot list already paid. */
  /** The pre-cap pinned inverted index: [[gids]](distinct = true)
    * repartitioned by gid. Shared by [[cappedGids]] (which builds the
    * hot-gram filter on top) and d16's tier count — both construct
    * the identical plan, so the cache manager serves one entry. */
  private[graft] def pinnedGids(s: SparkSession, dir: String): DataFrame = {
    val par = s.sparkContext.defaultParallelism
    Pin(gids(s, dir, distinct = true)
      .repartition(par, col("gid")))
  }

  /** Docs eligible for shingle-grain dedup = docs with ≥3 tokens =
    * distinct doc_ids in [[pinnedGids]] (a ≥3-token doc has ≥1
    * shingle; explode drops empty arrays). Counting off the pin means
    * the tier decision's scalar costs a cache fill that every
    * downstream detector reuses — NOT an extra corpus scan. */
  private[graft] def eligibleDocCount(s: SparkSession, dir: String): Long =
    pinnedGids(s, dir).agg(countDistinct(col("doc_id")))
      .head().getLong(0)

  private[queries] def cappedGids(
      s: SparkSession, dir: String): DataFrame = {
    val g = pinnedGids(s, dir)
    val hot = g.groupBy("gid").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(autoDfCap(g)))
      .filter(col("df") > col("cap")).select("gid")
    Pin(g.join(broadcast(hot), Seq("gid"), "left_anti")
      .select("doc_id", "gid")) // join key moves first; restore order
  }

  /** Size-ANNOTATED inverted index (PPJoin, Xiao et al. 2008): each
    * [[cappedGids]] row carries its doc's post-cap gram count n.
    * Costs one doc_id exchange + the restore-gid exchange — both at
    * INDEX grain (16 B rows), an order of magnitude below the
    * candidate sets they optimize. Pinned and SHARED (d02's self-join
    * reads it twice, d15 twice more — one definition → one cache
    * entry). */
  private[queries] def sizedGids(s: SparkSession, dir: String): DataFrame = {
    val par = s.sparkContext.defaultParallelism
    Pin(cappedGids(s, dir)
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy("doc_id")))
      .repartition(par, col("gid")))
  }

  // ---------------------------------------------------------------
  // d01 exact dedup — hash-groupBy canonicalization: every doc mapped
  // to the smallest doc_id sharing its md5(text). One shuffle on the
  // 128-bit content hash; at 100 TB the hash (16 B) shuffles, the
  // text (KBs) does not need to.
  val d01 = Q(
    "d01_exact_dedup",
    """SELECT doc_id, md5(text) AS fingerprint,
      |  MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
      |  COUNT(*) OVER (PARTITION BY md5(text)) AS group_size,
      |  doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
      |FROM documents""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("fingerprint")
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("fingerprint"))
      .withColumn("canonical_id", min("doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
  }

  // ---------------------------------------------------------------
  // d02 n-gram Jaccard near-dup — inverted-index candidate join on
  // shared shingles (no cross join: pairs sharing zero grams are never
  // materialized), exact |∩|/|∪| from integer counts. The join key is
  // the 60-bit gram hash, not the gram text: the self-join shuffles
  // 8-byte longs instead of ~25-byte strings (both engines hash with
  // the same md5 prefix, so any collision collapses identically on
  // both sides). Hub shingles would skew the self-join at scale → a
  // prefix-filter or document-frequency cap slots in on the `h`
  // relation without changing shape.
  val d02 = Q(
    "d02_ngram_jaccard",
    s"""$gidsCte,
      |h AS (SELECT doc_id, gid FROM g WHERE gid NOT IN
      |        (SELECT gid FROM g GROUP BY gid HAVING COUNT(*) > ${capSql("g")})),
      |n AS (SELECT doc_id, COUNT(*) AS n FROM h GROUP BY doc_id),
      |p AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |        CAST(COUNT(*) AS BIGINT) AS inter
      |      FROM h x JOIN h y ON x.gid = y.gid AND x.doc_id < y.doc_id
      |      GROUP BY 1, 2)
      |SELECT doc_a, doc_b, inter,
      |  na.n + nb.n - inter AS union_size,
      |  CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jaccard
      |FROM p JOIN n na ON p.doc_a = na.doc_id
      |       JOIN n nb ON p.doc_b = nb.doc_id
      |WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= $JaccardMin""".stripMargin) {
    (s, dir) =>
      // document-frequency cap + pins live in [[cappedGids]] (shared
      // with s06): a hub shingle appearing in >cap docs would square
      // into >500k candidate pairs on ONE shuffle key — the standard
      // capped-Jaccard guard, mirrored in the oracle so both engines
      // drop the same grams. The relation fans out FOUR ways here
      // (both self-join sides + the two doc-size joins); unpinned,
      // each consumer re-runs the shingle pass and the anti-join —
      // the plan audit showed 4× the df-cap shuffle, which dominated
      // d02's data path. Its gid pre-partitioning makes the self-join
      // below exchange-free.
      val par = s.sparkContext.defaultParallelism
      val hn = sizedGids(s, dir)
      // candidate pairs ≈ unique groups (little map-side reduction), so
      // the pair aggregation is the widest stage of the query. The
      // size filter runs BEFORE that shuffle: J ≥ t forces
      // min(na,nb) ≥ t·max(na,nb) (inter ≤ min and
      // inter ≥ t·(na+nb−inter) combine to it), so violating
      // candidates — ~40 % of rows on the Heaps-law scale corpus —
      // are dropped in the map stage with output-identical semantics.
      // Carrying n through the agg (pairs are size-functional) also
      // removes the two PAIR-grain size joins the old plan paid; at
      // corpus scale those stop broadcasting and would sort-merge the
      // 100M-row pair set twice. The parallelism floor keeps the agg
      // off one core when AQE coalesces the small shuffle (no-op at
      // scale, where the exchange is ≥ the advisory size on its own).
      hn.toDF("doc_a", "gid", "na")
        .join(hn.toDF("doc_b", "gid", "nb"), "gid")
        .filter(col("doc_a") < col("doc_b"))
        .filter(least(col("na"), col("nb")) >=
          lit(JaccardMin) * greatest(col("na"), col("nb")))
        .repartition(par, col("doc_a"), col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("inter"),
          max("na").as("na"), max("nb").as("nb"))
        .withColumn("union_size", col("na") + col("nb") - col("inter"))
        .withColumn("jaccard",
          col("inter").cast(DoubleType) / col("union_size"))
        .filter(col("jaccard") >= JaccardMin)
        .select("doc_a", "doc_b", "inter", "union_size", "jaccard")
  }

  // ---------------------------------------------------------------
  // d03 MinHash + LSH — 8 minhashes over shingles, 4 bands × 2 rows;
  // candidates come from per-band equi-joins (the LSH scale path: band
  // key is the shuffle key), est. Jaccard = fraction of agreeing
  // minhashes. One md5 per shingle; the 8 permutations are universal
  // hashes h_k(x) = (a_k·x + b_k) mod (2³¹−1) over the 31-bit base
  // hash (Broder 1997 §4) — pure BIGINT arithmetic, no 8× row blowup
  // and bit-identical in DuckDB.
  /** Oracle CTE chain ending in `sig` (doc_id + 8 minhash columns) —
    * shared by d03 (pair estimates) and d07 (cluster assignment). */
  private val mhSigCte =
    s"""$gidsRawCte,
      |h AS (SELECT doc_id, gid % 2147483647 AS x FROM g),
      |sig AS (SELECT doc_id,
      |  MIN((1000000007*x + 12345) % 2147483647) AS m0,
      |  MIN((998244353*x + 54321) % 2147483647) AS m1,
      |  MIN((754974721*x + 88883) % 2147483647) AS m2,
      |  MIN((469762049*x + 13577) % 2147483647) AS m3,
      |  MIN((167772161*x + 97531) % 2147483647) AS m4,
      |  MIN((1224736769*x + 24680) % 2147483647) AS m5,
      |  MIN((1051721729*x + 86420) % 2147483647) AS m6,
      |  MIN((1107296257*x + 11111) % 2147483647) AS m7
      |  FROM h GROUP BY doc_id)""".stripMargin

  /** `sig a JOIN sig b` match count / band agreement, as SQL text. */
  private val mhMatchesSql = (0 to 7)
    .map(k => s"CASE WHEN a.m$k=b.m$k THEN 1 ELSE 0 END")
    .mkString("(", " + ", ")")
  private val mhBandsSql = (0 to 3)
    .map(b => s"(a.m${2 * b}=b.m${2 * b} AND a.m${2 * b + 1}=b.m${2 * b + 1})")
    .mkString("(", " OR ", ")")

  /** d03's frame: banded candidate pairs + minhash-agreement estimate
    * (also the edge generator for d07's cluster assignment). */
  /** The 8 MinHash (a, b) mixing pairs — ONE Scala definition shared
    * by [[minhashPairs]] and the streaming intake twin
    * ([[graft.streaming.IngestDedup.nearDupBands]]); `mhSigCte` above
    * is the same constants as SQL text (it is built by string
    * interpolation before this object initializes, so it cannot
    * reference this val — the band-anchor spec pins the two against
    * each other). */
  private[graft] val MhMix: Seq[(Long, Long)] = Seq(
    1000000007L -> 12345L, 998244353L -> 54321L,
    754974721L -> 88883L, 469762049L -> 13577L,
    167772161L -> 97531L, 1224736769L -> 24680L,
    1051721729L -> 86420L, 1107296257L -> 11111L)

  private def minhashPairs(s: SparkSession, dir: String): DataFrame = {
      val h = gids(s, dir, distinct = false)
        .select(col("doc_id"), (col("gid") % 2147483647L).as("x"))
      val mins = (0 to 7).map(k =>
        min((lit(MhMix(k)._1) * col("x") + lit(MhMix(k)._2))
          % 2147483647L).as(s"m$k"))
      // one row per doc; feeds 4 band joins + 2 signature re-joins —
      // pin it so the shingle+hash pass runs once
      val sig = Pin(h.groupBy("doc_id").agg(mins.head, mins.tail: _*))
      val aCols = "doc_a" +: (0 to 7).map(k => s"a$k")
      val bCols = "doc_b" +: (0 to 7).map(k => s"b$k")
      val sa = sig.toDF(aCols: _*)
      val sb = sig.toDF(bCols: _*)
      // ONE band join instead of four: explode each signature to
      // (doc_id, band, band_key) rows and self-equi-join on
      // (band, band_key). The key m_even·(2³¹−1)+m_odd is a
      // collision-free pairing of the band's two minhashes (both
      // < 2³¹−1), so this is exactly the per-band equality — 4
      // shuffles + union + distinct collapse into 1 join + 1 distinct.
      val bandKeys = (0 to 3).map(band =>
        col(s"m${2 * band}") * lit(2147483647L) + col(s"m${2 * band + 1}"))
      val bands = sig.select(col("doc_id"),
        posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
      val cand = bands.toDF("doc_a", "band", "bkey")
        .join(bands.toDF("doc_b", "band", "bkey"), Seq("band", "bkey"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
      val matches = (0 to 7)
        .map(k => when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
        .reduce(_ + _)
      cand.join(sa, "doc_a").join(sb, "doc_b")
        .select(col("doc_a"), col("doc_b"),
          matches.as("n_matching_minhashes"),
          (matches / lit(8.0)).as("est_jaccard"))
  }

  val d03 = Q(
    "d03_minhash_lsh",
    s"""$mhSigCte
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  $mhMatchesSql AS n_matching_minhashes,
      |  $mhMatchesSql / 8.0 AS est_jaccard
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND
      |  $mhBandsSql""".stripMargin)(minhashPairs)

  // ---------------------------------------------------------------
  // d07 near-dup cluster assignment — the step a real dedup pipeline
  // runs AFTER candidate generation: verified LSH pairs (est. Jaccard
  // ≥ 0.5) form an undirected graph; connected components elect one
  // canonical document per cluster (min doc_id), everything else in
  // the cluster is droppable. Spark side is
  // [[graft.operators.GraphOps.connectedComponents]] (min-label
  // flooding, one join+agg per round, diameter-bounded); the oracle
  // computes the same fixpoint as a recursive transitive closure —
  // feasible only because near-dup clusters are tiny, which is also
  // why the distributed loop converges in a handful of rounds at any
  // corpus size.
  val d07 = Q(
    "d07_components",
    s"""${mhSigCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |          FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND
      |            $mhBandsSql
      |          WHERE $mhMatchesSql >= 4),
      |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |      UNION ALL SELECT doc_b, doc_a FROM pairs),
      |walk(node, lbl) AS (
      |  SELECT src, src FROM e
      |  UNION
      |  SELECT e2.dst, w.lbl FROM walk w JOIN e e2 ON e2.src = w.node),
      |comp AS (SELECT node AS doc_id, MIN(lbl) AS component_id
      |         FROM walk GROUP BY node)
      |SELECT doc_id, component_id,
      |  COUNT(*) OVER (PARTITION BY component_id) AS component_size,
      |  doc_id = component_id AS is_canonical
      |FROM comp""".stripMargin) { (s, dir) =>
    val edges = minhashPairs(s, dir)
      .filter(col("n_matching_minhashes") >= 4)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    GraphOps.connectedComponents(edges)
      .select(col("id").as("doc_id"), col("component").as("component_id"))
      .withColumn("component_size",
        count(lit(1)).over(Window.partitionBy("component_id")))
      .withColumn("is_canonical", col("doc_id") === col("component_id"))
  }

  // ---------------------------------------------------------------
  // d09 LSH quality report — the evaluation a dedup pipeline runs
  // before trusting its index: d03's banded candidates scored against
  // d02's exact-Jaccard ground truth (the ≥0.5 pairs under the same
  // df cap). One row: candidate/truth/hit counts, recall (what the
  // bands missed) and precision (how much verification work the bands
  // force). Both sides are the EXISTING operators' plans — the oracle
  // splices the single-sourced gram/signature fragments, so the
  // report can never drift from what d02/d03 actually compute; the
  // three count aggregates cross-join as 1-row frames (the audited
  // g02 pattern).
  val d09 = Q(
    "d09_lsh_quality",
    s"""${mhSigCte},
      |gd AS (SELECT DISTINCT doc_id, gid FROM g),
      |hh AS (SELECT doc_id, gid FROM gd WHERE gid NOT IN
      |        (SELECT gid FROM gd GROUP BY gid HAVING COUNT(*) > ${capSql("gd")})),
      |nn AS (SELECT doc_id, COUNT(*) AS n FROM hh GROUP BY doc_id),
      |pp AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |        CAST(COUNT(*) AS BIGINT) AS inter
      |      FROM hh x JOIN hh y ON x.gid = y.gid AND x.doc_id < y.doc_id
      |      GROUP BY 1, 2),
      |truth AS (SELECT doc_a, doc_b
      |      FROM pp JOIN nn na ON pp.doc_a = na.doc_id
      |              JOIN nn nb ON pp.doc_b = nb.doc_id
      |      WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= $JaccardMin),
      |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |      FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND
      |        $mhBandsSql),
      |hits AS (SELECT t.doc_a FROM truth t
      |      JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
      |SELECT
      |  CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true_pairs,
      |  CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidate_pairs,
      |  CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS n_hits,
      |  CASE WHEN (SELECT COUNT(*) FROM truth) > 0 THEN
      |    (SELECT COUNT(*) FROM hits)::DOUBLE /
      |      (SELECT COUNT(*) FROM truth) END AS lsh_recall,
      |  CASE WHEN (SELECT COUNT(*) FROM cand) > 0 THEN
      |    (SELECT COUNT(*) FROM hits)::DOUBLE /
      |      (SELECT COUNT(*) FROM cand) END AS lsh_precision""".stripMargin) {
    (s, dir) =>
      // both frames feed two consumers (their count + the hit join):
      // pin so d02's pair aggregation and d03's band join run once
      val truth = Pin(d02.run(s, dir).select("doc_a", "doc_b"))
      val cand = Pin(minhashPairs(s, dir).select("doc_a", "doc_b"))
      val hits = truth.join(cand, Seq("doc_a", "doc_b"))
      truth.agg(count(lit(1)).as("n_true_pairs"))
        .crossJoin(cand.agg(count(lit(1)).as("n_candidate_pairs")))
        .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
        .select(col("n_true_pairs"), col("n_candidate_pairs"),
          col("n_hits"),
          when(col("n_true_pairs") > 0,
            col("n_hits").cast(DoubleType) / col("n_true_pairs"))
            .as("lsh_recall"),
          when(col("n_candidate_pairs") > 0,
            col("n_hits").cast(DoubleType) / col("n_candidate_pairs"))
            .as("lsh_precision"))
  }

  // ---------------------------------------------------------------
  // d08 cross-source duplication matrix — the provenance report a
  // corpus curation pass runs on d05's fingerprints: for every ordered
  // source pair (a, b), how many of a's documents have a fingerprint
  // that also appears in b (mirror sites, syndicated feeds, scraped
  // re-posts), as a count and a share of a's fingerprinted docs. One
  // fingerprint groupBy + an equi-join on the 8-byte fp; the join
  // fan-out per doc is bounded by the number of SOURCES (not corpus
  // size), and the matrix itself is |sources|² — driver-scale at any
  // corpus size.
  val d08 = Q(
    "d08_cross_source_dups",
    s"""$gidsRawCte,
      |fp AS (SELECT doc_id, MIN(gid) AS fp FROM g GROUP BY doc_id),
      |d AS (SELECT f.doc_id, doc.source, f.fp
      |      FROM fp f JOIN documents doc ON f.doc_id = doc.doc_id),
      |b AS (SELECT DISTINCT fp, source FROM d),
      |na AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      |       FROM d GROUP BY source)
      |SELECT a.source AS source_a, b.source AS source_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_dup_docs,
      |  na.n_docs AS n_docs_a,
      |  CAST(COUNT(*) AS DOUBLE) / na.n_docs AS dup_share
      |FROM d a
      |JOIN b ON a.fp = b.fp AND a.source <> b.source
      |JOIN na ON na.source = a.source
      |GROUP BY a.source, b.source, na.n_docs""".stripMargin) { (s, dir) =>
    // fp per doc = d05's 1-permutation MinHash (MIN over raw gram
    // hashes); join back for source, then count (doc, other-source)
    // hits — ≤1 row per doc per other source by the DISTINCT
    val fp = gids(s, dir, distinct = false)
      .groupBy("doc_id").agg(min(col("gid")).as("fp"))
    val d = fp.join(
      Tables.load(s, dir, "documents").select("doc_id", "source"),
      "doc_id")
    val dp = graft.operators.Pin(d)
    val b = dp.select(col("fp"), col("source").as("source_b")).distinct()
    val na = dp.groupBy("source").agg(count(lit(1)).as("n_docs_a"))
    dp.select(col("source").as("source_a"), col("fp").as("fp_a"))
      .join(b, col("fp_a") === col("fp") &&
        col("source_a") =!= col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_dup_docs"))
      .join(na.withColumnRenamed("source", "source_a"), "source_a")
      .select(col("source_a"), col("source_b"), col("n_dup_docs"),
        col("n_docs_a"),
        (col("n_dup_docs").cast(DoubleType) / col("n_docs_a"))
          .as("dup_share"))
  }

  // ---------------------------------------------------------------
  // d04 SimHash — Charikar fingerprint over shingle hashes;
  // candidates by pigeonhole on 4 pieces (hamming ≤ 3 ⇒ at least one
  // piece equal), verified with bit_count(xor) ≤ 3. The bit counters
  // are conditional-sum agg columns over the gram rows — one codegen'd
  // groupBy, no per-bit row blowup. The piece equi-join is the scale
  // path, and PIECE WIDTH is the scale knob: a piece addresses 2^width
  // buckets, so expected bucket population is N/2^width and candidate
  // volume is Σ_bucket pop² — 8-bit pieces (256 buckets) saturate
  // around 10^5 docs (measured: d04's steady state went 2.9 s at 50k
  // docs → 151 s at 500k on the Heaps-law corpus, pure bucket-pair
  // algebra), while 15-bit pieces (32k buckets) keep the same corpus
  // at ~7.7 docs/bucket. d12 is the fixed 60/15 configuration; d04
  // (below) AUTO-DERIVES its width from the corpus size.
  private def simhashQ(name: String, bits: Int): Q = {
    val nPieces = 4
    val pw = bits / nPieces // piece width in bits
    require(pw * nPieces == bits, s"$bits bits must split into $nPieces")
    val mask = (1L << bits) - 1
    Q(name,
      s"""$gidsCte,
        |hh AS (SELECT doc_id, (gid & $mask) AS h FROM g),
        |bs AS (SELECT doc_id,
        |${(0 until bits).map(b => s"         SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(",\n")}
        |       FROM hh GROUP BY doc_id),
        |sim AS (SELECT doc_id, CAST(
        |${(0 until bits).map(b => s"         (CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" +\n")}
        |         AS BIGINT) AS simhash
        |        FROM bs)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin) {
      (s, dir) =>
        val hh = gids(s, dir, distinct = true)
          .select(col("doc_id"),
            col("gid").bitwiseAND(lit(mask)).as("h"))
        val bitSums = (0 until bits).map(b =>
          sum(when(expr(s"shiftright(h, $b) & 1") === 1, 1).otherwise(-1))
            .as(s"s$b"))
        val assemble = (0 until bits)
          .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _)
        val sim = Pin(hh // feeds both sides of the piece join
          .groupBy("doc_id")
          .agg(bitSums.head, bitSums.tail: _*)
          .select(col("doc_id"), assemble.as("simhash")))
        // pigeonhole: hamming<=3 over 4 pieces => >=1 piece identical
        val pieces = sim
          .withColumn("p", explode(sequence(lit(0), lit(nPieces - 1))))
          .select(col("doc_id"), col("simhash"), col("p"),
            expr(s"(simhash div shiftleft(1L, p*$pw)) % ${1L << pw}")
              .as("piece"))
        val cand = pieces.toDF("doc_a", "sim_a", "p", "piece")
          .join(pieces.toDF("doc_b", "sim_b", "p", "piece"),
            Seq("p", "piece"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b", "sim_a", "sim_b")
          .distinct()
        cand
          .withColumn("hamming",
            expr("CAST(bit_count(sim_a ^ sim_b) AS INT)"))
          .filter(col("hamming") <= 3)
          .select("doc_a", "doc_b", "hamming")
    }
  }

  /** Target docs per SimHash piece bucket for [[d04]]'s width
    * derivation: piece width pw = 8 + Σ_{j=9..15} [N > target·2^(j−1)]
    * — the smallest pw in [8..15] with N ≤ target·2^pw (clamped at
    * 15). At the test SFs (≤5k docs) every indicator is 0 → pw = 8,
    * the historical 32-bit configuration, bit-for-bit; at the 500k-doc
    * Heaps corpus pw = 15 → the d12 configuration. */
  private[queries] val SimhashBucketTarget = 24L

  /** Oracle fragment: 2^(4·pw) = 2^32·Π(1+15·[nd>T·2^(j−1)]) over a
    * CTE `tot(nd)` in scope — the exact-integer width derivation
    * shared by [[d04]]'s oracle and d16's inline simhash member. */
  private[queries] val simhashW2Sql: String =
    "4294967296" + (9 to 15).map(j =>
      s" * (1 + 15*(tot.nd > ${SimhashBucketTarget * (1L << (j - 1))})" +
        "::BIGINT)").mkString

  /** d04 with the v20 auto-width contract (VERDICT r8 ask #1): the
    * FULL 60-bit Charikar fingerprint is always aggregated, and the
    * EFFECTIVE fingerprint is its low W = 4·pw bits, with pw derived
    * from the corpus size by exact integer comparisons mirrored in
    * the oracle — 2^pw = 256·Π(1+[N>T·2^(j−1)]) and
    * 2^(4·pw) = 2^32·Π(1+15·[N>T·2^(j−1)]) — so Spark and DuckDB
    * derive the identical width at every scale (no float log2). Bit b
    * of the 60-bit fingerprint equals bit b of the masked-input
    * fingerprint for b < W (the per-bit sums only read bit b of the
    * gram hash), so `simhash60 % 2^W` IS the W-bit fingerprint the
    * fixed-width construction computes: at pw = 8 the output is
    * bit-identical to the historical 32-bit d04, and at pw = 15 it
    * converges to d12. Fixes the measured 256-bucket saturation
    * (151 s at 500k docs) without a manual tier swap. */
  private def simhashAutoQ(name: String): Q = {
    val bits = 60
    val w2Sql = simhashW2Sql
    Q(name,
      s"""$gidsCte,
        |bs AS (SELECT doc_id,
        |${(0 until bits).map(b => s"         SUM(CASE WHEN (gid >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(",\n")}
        |       FROM g GROUP BY doc_id),
        |sim AS (SELECT doc_id, CAST(
        |${(0 until bits).map(b => s"         (CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" +\n")}
        |         AS BIGINT) AS sh
        |        FROM bs),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM sim),
        |eff AS (SELECT doc_id, sh % (SELECT $w2Sql FROM tot) AS simhash
        |        FROM sim)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |FROM eff a JOIN eff b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin) {
      (s, dir) =>
        val hh = gids(s, dir, distinct = true)
          .select(col("doc_id"), col("gid").as("h"))
        val bitSums = (0 until bits).map(b =>
          sum(when(expr(s"shiftright(h, $b) & 1") === 1, 1).otherwise(-1))
            .as(s"s$b"))
        val assemble = (0 until bits)
          .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _)
        // feeds the width-derivation count AND both piece-join sides
        val sim = Pin(hh
          .groupBy("doc_id")
          .agg(bitSums.head, bitSums.tail: _*)
          .select(col("doc_id"), assemble.as("sh")))
        // width derivation as ONE driver-side scalar sync off the pin
        // (the d16/d14 plan-time precedent) — the same exact-integer
        // indicator algebra as the oracle's p2Sql/w2Sql, but yielding
        // LITERAL divisors: with the derivation in-plan (a 1-row agg
        // crossJoined ABOVE the pin) the two piece-join sides were no
        // longer identical subtrees, defeating exchange reuse — each
        // bench rep shuffled the pieces twice and d04 ran 2.4× d12's
        // steady state at Heaps-100× despite deriving d12's exact
        // configuration. Literals restore d12's plan shape (one
        // reused exchange, constant-folded piece math).
        val nd = sim.count()
        val indL = (9 to 15).map(j =>
          if (nd > SimhashBucketTarget * (1L << (j - 1))) 1L else 0L)
        val p2 = indL.foldLeft(256L)((acc, i) => acc * (1L + i))
        val w2 = indL.foldLeft(4294967296L)((acc, i) =>
          acc * (1L + 15L * i))
        val eff = sim.select(col("doc_id"),
          (col("sh") % lit(w2)).as("simhash"))
        // pigeonhole: hamming<=3 over 4 pieces => >=1 piece identical
        // (p2 = 2^pw, p2^3 < 2^46 so the div chain stays in BIGINT)
        val pieces = eff.select(col("doc_id"), col("simhash"),
          posexplode(array(
            expr(s"simhash % ${p2}L"),
            expr(s"(simhash div ${p2}L) % ${p2}L"),
            expr(s"(simhash div ${p2 * p2}L) % ${p2}L"),
            expr(s"(simhash div ${p2 * p2 * p2}L) % ${p2}L")))
            .as(Seq("p", "piece")))
        val cand = pieces.toDF("doc_a", "sim_a", "p", "piece")
          .join(pieces.toDF("doc_b", "sim_b", "p", "piece"),
            Seq("p", "piece"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b", "sim_a", "sim_b")
          .distinct()
        cand
          .withColumn("hamming",
            expr("CAST(bit_count(sim_a ^ sim_b) AS INT)"))
          .filter(col("hamming") <= 3)
          .select("doc_a", "doc_b", "hamming")
    }
  }

  val d04 = simhashAutoQ("d04_simhash")

  // d12 — the fixed wide configuration kept as the documented contrast
  // tier: the full 60-bit shingle hash, 4×15-bit pieces (32k buckets
  // each). Hamming ≤ 3 over 60 bits is a TIGHTER near-dup criterion
  // than over 32, so d12 is the high-precision tier; d04's auto-width
  // derivation converges to exactly this configuration at ≥394k docs.
  val d12 = simhashQ("d12_simhash_wide", 60)

  // ---------------------------------------------------------------
  // d05 winnowing fingerprint — per-doc rolling fingerprint = min
  // shingle hash (1-permutation MinHash); docs sharing a fingerprint
  // are near-dup candidate groups. Single groupBy on a 8-byte key.
  val d05 = Q(
    "d05_fingerprint_groups",
    s"""$gidsRawCte,
      |fp AS (SELECT doc_id, MIN(gid) AS fingerprint
      |       FROM g GROUP BY doc_id)
      |SELECT fingerprint, COUNT(*) AS n_docs,
      |  MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
      |FROM fp GROUP BY fingerprint HAVING COUNT(*) >= 2""".stripMargin) {
    (s, dir) =>
      gids(s, dir, distinct = false)
        .groupBy("doc_id")
        .agg(min(col("gid")).as("fingerprint"))
        .groupBy("fingerprint")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("min_doc_id"),
          max("doc_id").as("max_doc_id"))
        .filter(col("n_docs") >= 2)
  }

  // ---------------------------------------------------------------
  // d06 embedding-cosine near-dup — exact integer cosine within
  // (label, coarse-cell) blocks. The cell is an IVF-style orthant
  // code: the sign pattern of [[D06CellBits]] embedding dims, two
  // bands OR'd LSH-style for recall (a pair is a candidate if it
  // agrees on EITHER band's cell). Each band is a plain equi-join on
  // (label, cell): block size is bounded by corpus/(labels·2^bits)
  // instead of corpus/labels — the bare-label key was O(N) per block
  // and within-block pairing went quadratic at scale. At 100 TB you
  // widen D06CellBits (same plan, finer cells), exactly like d04's
  // widen-to-64-bit note. Vectors pre-scaled to BIGINT once
  // ([[graft.functions.Fns.scaleVec]]); signs are taken on the scaled
  // ints so both engines see identical cells; pair loop is pure
  // integer multiply-add. CELL WIDTH is the scale knob (same algebra
  // as d04's piece width): expected cell population is
  // N/(labels·2^bits), so candidate volume Σ_cell pop² grows
  // quadratically in N at FIXED bits — measured on the Heaps corpus,
  // the 4-bit band volume is 1.5M pairs at 20k vectors but 154M at
  // 200k. Unlike the text operators, vocabulary growth cannot save
  // this join: the blocking key space is constant. So bits must grow
  // with log₂(N): d06 (below) AUTO-DERIVES bits from the corpus size,
  // d13 is the fixed 8-bit configuration (2560 cells at 10 labels —
  // 13.7M pairs at 200k vectors). A candidate must agree on all 8
  // sign bits of a band, so the 8-bit tier is high-precision: per-dim
  // sign-agreement probability is 1−θ/π, making 8-bit band recall
  // ≈96 % for true duplicates (cos≥0.99) and negligible for the loose
  // cos≈0.3 tail the 4-bit tier sweeps up.

  /** Oracle fragment: orthant code over sx[from .. from+bits-1]
    * (1-indexed), bit i set when the scaled component is > 0. A
    * position past the vector's length contributes bit 0 (DuckDB's
    * out-of-range list index is NULL, and NULL > 0 is not true). */
  private[queries] def orthantSql(from: Int, bits: Int): String =
    (0 until bits)
      .map(i => s"(CASE WHEN sx[${from + i}] > 0 THEN ${1 << i} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Spark twin of [[orthantSql]] over the `sx` column.
    * try_element_at, not element_at: the oracle's `sx[i]` yields NULL
    * past the vector's length, so short vectors get bit 0 there —
    * ANSI element_at would throw instead (d06's band 2 reads dims
    * 5–12, and callers may hold narrower embeddings). */
  private[queries] def orthantCol(from: Int, bits: Int): Column =
    (0 until bits)
      .map(i => when(try_element_at(col("sx"), lit(from + i)) > 0,
        lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  private def embNearDupQ(name: String, bits: Int): Q = Q(
    name,
    s"""WITH e AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> round(x::DOUBLE*1e6)::BIGINT) AS sx
      |  FROM embeddings),
      |n AS (SELECT vec_id, label, sx,
      |  CAST(list_sum(list_transform(sx, x -> x*x)) AS BIGINT) AS nn,
      |  ${orthantSql(1, bits)} AS c1, ${orthantSql(1 + bits, bits)} AS c2
      |  FROM e)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
      |  CAST(list_sum(list_transform(list_zip(a.sx, b.sx),
      |    x -> x[1]*x[2])) AS BIGINT)::DOUBLE
      |    / (sqrt(a.nn::DOUBLE) * sqrt(b.nn::DOUBLE)) AS cosine
      |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      |  AND (a.c1 = b.c1 OR a.c2 = b.c2)
      |WHERE cosine >= 0.3""".stripMargin) { (s, dir) =>
    // fans out six ways (both sides of two band joins + the two
    // verification sides): pin so scaleVec+norm+orthant runs once
    val e = Pin(Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        Fns.scaleVec(col("embedding")).as("sx"))
      .withColumn("nn", VectorExprs.normSqIntNative(col("sx")))
      .withColumn("c1", orthantCol(1, bits))
      .withColumn("c2", orthantCol(1 + bits, bits)))
    // one equi-join per band (the OR in the oracle's join condition
    // would force a non-equi join in Spark; union-distinct of per-band
    // equi-joins is the same set — d03's band pattern), with the exact
    // cosine computed INSIDE the band join. The join sides are the
    // full (compact) vector rows — N rows per side, not candidates —
    // so the only shuffles are the two band-key exchanges of the
    // corpus itself; the candidate blow-up exists solely as the join's
    // streamed output, consumed by the cosine filter in the same
    // stage. The previous shape (distinct candidate ids, then re-join
    // both signature arrays) shuffled the CANDIDATE set three times —
    // 27 M rows at the 500k-vector scale run vs 2×500k here. A pair
    // agreeing on both bands computes its cosine twice (bounded 2×
    // compute); the final distinct dedups it exactly because the
    // expression is deterministic integer arithmetic.
    val cos = Fns.cosineFromScaled(
      VectorExprs.dotIntNative(col("sx_a"), col("sx_b")),
      col("nn_a"), col("nn_b"))
    Seq("c1", "c2").map { c =>
      e.select(col("vec_id").as("vec_a"), col("label"), col(c).as("c"),
          col("sx").as("sx_a"), col("nn").as("nn_a"))
        .join(e.select(col("vec_id").as("vec_b"), col("label"),
          col(c).as("c"), col("sx").as("sx_b"), col("nn").as("nn_b")),
          Seq("label", "c"))
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"), col("label"),
          cos.as("cosine"))
        .filter(col("cosine") >= 0.3)
    }.reduce(_ union _).distinct()
  }

  /** Target vectors per (label, cell) block for [[d06]]'s width
    * derivation: bits = 4 + Σ_{j=5..16} [Nv > target·2^(j−1)] — the
    * smallest bits in [4..16] with Nv ≤ target·2^bits (clamped at 16,
    * the bands' computed dim span). Test SFs (≤2k vectors) → 4 bits,
    * the historical configuration bit-for-bit; the 20k-vector Heaps
    * 10× / sf1 tier → 8 bits, d13's width; the 200k-vector 100× tier
    * → 11 bits (150·2^10 = 153,600 < 200,000 ≤ 307,200 — the r10
    * widening moved this tier OFF the round-9 8-bit construction, so
    * its output and recall change there by design; ADVICE r10); the
    * 2M-vector 1000× tier → 14 bits. The ladder MUST outgrow 8 bits: with the clamp at 8 the
    * expected cell population (Nv / (labels·2^bits)) resumes growing
    * linearly in Nv beyond ~1.2M vectors and the within-cell pair
    * volume goes quadratic again — measured as a 31× step for 10×
    * data at the 1000× tier (249 s; ~25 s after this fix). Per-dim
    * sign agreement for cos ≥ 0.99 true dups is ≈0.97, so band
    * recall at 14 bits is ≈0.97^14 ≈ 0.65 and two bands give ≈0.88 —
    * the documented wide-tier recall trade (d13 stays the fixed-width
    * contrast tier). */
  private[queries] val D06TargetCell = 150L

  /** d06 with the v20 auto-width contract (VERDICT r8 ask #1): both
    * orthant bands are always computed at the FULL 16-bit span and
    * masked to the derived width with `% 2^bits`, where 2^bits =
    * 16·Π(1+[Nv>T·2^(j−1)]) is exact integer arithmetic mirrored in
    * the oracle. Band 1 reads dims 1–16 and band 2 dims 5–20 — band 2
    * is ANCHORED at dim 5 so that at bits = 4 the masked cells are
    * exactly the historical dims 1–4 / 5–8 bands (orthant(5,16) % 16
    * ≡ orthant(5,4) by the bit layout) and the narrow-tier output is
    * unchanged; at bits = 8 the mask reduces both bands to the
    * round-9 dims-1–8 / 5–12 layout bit-for-bit, so every oracled SF
    * (≤20k vectors — the test SFs at 4 bits and the sf1/Heaps-10×
    * tier at 8) is byte-identical to the 8-span construction. The
    * 200k-vector 100× tier derives 11 bits under the widened ladder
    * (ADVICE r10), so ITS output is not — a deliberate recall/cell
    * trade at a tier no oracle gates; cross-engine agreement is
    * unaffected because the oracle mirrors the same derivation.
    * Bands overlap above 4 bits (a bounded recall correlation, traded
    * for output stability at the narrow tier — d13 keeps the
    * non-overlapping 1–8/9–16 layout). Fixes the measured
    * cell-population quadratic — first at 200k vectors (15 s, fixed
    * 4-bit cells), then again at 2M when the ladder clamped at 8 bits
    * (249 s at the 1000× tier) — without a manual tier swap. */
  private def embNearDupAutoQ(name: String): Q = {
    val thresholds = (5 to 16).map(j => D06TargetCell * (1L << (j - 1)))
    val b2Sql = "16" +
      thresholds.map(t => s" * (1 + (tot.nv > $t)::BIGINT)").mkString
    Q(name,
      s"""WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> round(x::DOUBLE*1e6)::BIGINT) AS sx
        |  FROM embeddings),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv FROM embeddings),
        |n AS (SELECT vec_id, label, sx,
        |  CAST(list_sum(list_transform(sx, x -> x*x)) AS BIGINT) AS nn,
        |  ${orthantSql(1, 16)} % ($b2Sql) AS c1,
        |  ${orthantSql(5, 16)} % ($b2Sql) AS c2
        |  FROM e, tot)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
        |  CAST(list_sum(list_transform(list_zip(a.sx, b.sx),
        |    x -> x[1]*x[2])) AS BIGINT)::DOUBLE
        |    / (sqrt(a.nn::DOUBLE) * sqrt(b.nn::DOUBLE)) AS cosine
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |  AND (a.c1 = b.c1 OR a.c2 = b.c2)
        |WHERE cosine >= 0.3""".stripMargin) { (s, dir) =>
      // same plan as [[embNearDupQ]] (exact cosine INSIDE the band
      // joins — see its builder comments) plus the 1-row corpus total
      // broadcast into the pin for the width mask
      val ind = (5 to 16).map(j =>
        when(col("nv") > D06TargetCell * (1L << (j - 1)), 1L)
          .otherwise(0L))
      val tot = Tables.load(s, dir, "embeddings")
        .agg(count(lit(1)).as("nv"))
        .select(ind.map(i => lit(1L) + i).foldLeft(lit(16L))(_ * _)
          .as("b2"))
      val e = Pin(Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          Fns.scaleVec(col("embedding")).as("sx"))
        .withColumn("nn", VectorExprs.normSqIntNative(col("sx")))
        .crossJoin(broadcast(tot))
        .withColumn("c1", orthantCol(1, 16) % col("b2"))
        .withColumn("c2", orthantCol(5, 16) % col("b2"))
        .drop("b2"))
      val cos = Fns.cosineFromScaled(
        VectorExprs.dotIntNative(col("sx_a"), col("sx_b")),
        col("nn_a"), col("nn_b"))
      Seq("c1", "c2").map { c =>
        e.select(col("vec_id").as("vec_a"), col("label"), col(c).as("c"),
            col("sx").as("sx_a"), col("nn").as("nn_a"))
          .join(e.select(col("vec_id").as("vec_b"), col("label"),
            col(c).as("c"), col("sx").as("sx_b"), col("nn").as("nn_b")),
            Seq("label", "c"))
          .filter(col("vec_a") < col("vec_b"))
          .select(col("vec_a"), col("vec_b"), col("label"),
            cos.as("cosine"))
          .filter(col("cosine") >= 0.3)
      }.reduce(_ union _).distinct()
    }
  }

  val d06 = embNearDupAutoQ("d06_embedding_neardup")

  // d13 — the fixed wide configuration kept as the documented contrast
  // tier (non-overlapping 8-bit orthant bands over dims 1–16); d06's
  // auto-width derivation reaches the same cell COUNT at ≥19.2k
  // vectors (band-2 dims differ — see the anchoring note above).
  val d13 = embNearDupQ("d13_embedding_neardup_wide", 8)

  // ---------------------------------------------------------------
  // d10 dedup APPLY — the step that actually produces the cleaned
  // corpus: d01–d09 report duplicates, this one removes them. d07's
  // cluster assignment (LSH pairs ≥4/8 minhashes → connected
  // components → min-doc_id canonical) drives a keep/drop decision
  // per document, aggregated into the per-source retention report a
  // curation pipeline publishes (docs in, docs removed, docs kept,
  // characters surviving). Closest reference shape: the set-difference
  // ops of SURVEY §2.7 (`safe_eval.py` list ops) composed with the
  // d07 clustering — no native equivalent; this is the engine
  // extension the BASELINE.json north star asks for.
  //
  // Scale shape: `removed` is the non-canonical cluster members —
  // proportional to the corpus duplication rate, NOT driver-scale —
  // so it joins the corpus by shuffle on doc_id (deliberately NO
  // broadcast hint: at 100 TB with 30 % duplication the removed set
  // is 30 TB of keys; AQE may still broadcast it at small SF). The
  // final aggregate is |sources| rows.
  val d10 = Q(
    "d10_dedup_apply",
    s"""${mhSigCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |          FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND
      |            $mhBandsSql
      |          WHERE $mhMatchesSql >= 4),
      |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |      UNION ALL SELECT doc_b, doc_a FROM pairs),
      |walk(node, lbl) AS (
      |  SELECT src, src FROM e
      |  UNION
      |  SELECT e2.dst, w.lbl FROM walk w JOIN e e2 ON e2.src = w.node),
      |removed AS (SELECT node AS doc_id FROM walk
      |            GROUP BY node HAVING node <> MIN(lbl))
      |SELECT d.source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
      |    AS n_removed,
      |  CAST(SUM(CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  CAST(SUM(CASE WHEN r.doc_id IS NULL THEN d.n_chars ELSE 0 END)
      |    AS BIGINT) AS chars_kept
      |FROM documents d LEFT JOIN removed r ON d.doc_id = r.doc_id
      |GROUP BY d.source""".stripMargin) { (s, dir) =>
    val edges = minhashPairs(s, dir)
      .filter(col("n_matching_minhashes") >= 4)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val removed = GraphOps.connectedComponents(edges)
      .filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"), lit(1L).as("rm"))
    Tables.load(s, dir, "documents")
      .join(removed, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("rm"), lit(0L))).as("n_removed"),
        sum(when(col("rm").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rm").isNull, col("n_chars")).otherwise(0L))
          .as("chars_kept"))
  }

  // ---------------------------------------------------------------
  // d11 cross-document repeated-span report — substring-level dedup
  // pressure (Lee et al. 2022, "Deduplicating Training Data Makes
  // Language Models Better": repeated ~50-token substrings; here the
  // word-8-gram grain the test corpus' 10–100-token documents
  // support). A span INSTANCE is duplicated when its 8-token window
  // hash occurs in ≥ 2 distinct documents; the per-source report is
  // the "how much of this source is boilerplate" signal a curation
  // pass ranks sources by — complementing d02's doc-level Jaccard
  // (which misses a template paragraph shared by otherwise-different
  // docs) and t07's WITHIN-doc repetition.
  //
  // 100 TB shape: unlike the similarity joins, no document PAIR is
  // ever formed — volume is bounded by span instances (≈ token
  // count). The (doc, hash, k) relation pins once and feeds both the
  // doc-frequency count and the coverage join; both shuffles key on
  // the 8-byte span hash, and a hub span (a boilerplate header in
  // millions of docs) costs its instance count, never df², so no
  // df cap is needed at all.
  val d11 = Q(
    "d11_span_dedup",
    s"""WITH t AS (SELECT doc_id, source, string_split(text,' ') AS ws
      |           FROM documents),
      |sp AS (SELECT doc_id,
      |         unnest([${Fns.hash60Sql("array_to_string(ws[i:i+7], ' ')")}
      |                 FOR i IN range(1, len(ws)-6)]) AS h
      |       FROM t WHERE len(ws) >= 8),
      |spd AS (SELECT doc_id, h, COUNT(*) AS k FROM sp GROUP BY doc_id, h),
      |dfs AS (SELECT h, COUNT(*) AS df FROM spd GROUP BY h),
      |dup AS (SELECT spd.doc_id,
      |          CAST(SUM(CASE WHEN dfs.df >= 2 THEN spd.k ELSE 0 END)
      |            AS BIGINT) AS dup_k
      |        FROM spd JOIN dfs ON spd.h = dfs.h GROUP BY spd.doc_id),
      |doc AS (SELECT t.doc_id, t.source,
      |          CAST(GREATEST(len(ws)-7, 0) AS BIGINT) AS n_spans,
      |          COALESCE(dup.dup_k, 0) AS dup_spans
      |        FROM t LEFT JOIN dup ON t.doc_id = dup.doc_id)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_spans) AS BIGINT) AS spans_total,
      |  CAST(SUM(dup_spans) AS BIGINT) AS dup_spans_total,
      |  CAST(SUM(dup_spans) AS DOUBLE) / NULLIF(SUM(n_spans), 0)
      |    AS dup_span_ratio,
      |  CAST(SUM(CASE WHEN n_spans > 0 AND 2*dup_spans >= n_spans
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy_docs
      |FROM doc GROUP BY source""".stripMargin) { (s, dir) =>
    val t = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), Fns.tokens(col("text")).as("ws"))
    // one row per 8-token window; sub-8-token docs contribute none
    val sp = t.filter(size(col("ws")) >= 8)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ws")) - 7),
          i => Fns.hash60(concat_ws(" ", slice(col("ws"), i, lit(8)))))).as("h"))
    // (doc, hash, multiplicity): pinned — feeds df count AND coverage
    val spd = graft.operators.Pin(
      sp.groupBy("doc_id", "h").agg(count(lit(1)).as("k")))
    val dfs = spd.groupBy("h").agg(count(lit(1)).as("df"))
    val dup = spd.join(dfs, "h")
      .groupBy("doc_id")
      .agg(sum(when(col("df") >= 2, col("k")).otherwise(0L)).as("dup_k"))
    t.select(col("doc_id"), col("source"),
        greatest(size(col("ws")) - 7, lit(0)).cast(LongType).as("n_spans"))
      .join(dup, Seq("doc_id"), "left")
      .withColumn("dup_spans", coalesce(col("dup_k"), lit(0L)))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_spans").as("spans_total"),
        sum("dup_spans").as("dup_spans_total"),
        (sum("dup_spans").cast(DoubleType) /
          nullif(sum("n_spans"), lit(0L))).as("dup_span_ratio"),
        sum(when(col("n_spans") > 0 &&
          col("dup_spans") * 2 >= col("n_spans"), 1L).otherwise(0L))
          .as("n_heavy_docs"))
  }

  // ---------------------------------------------------------------
  // d15 asymmetric containment dedup — the near-SUPERSET detector
  // Jaccard structurally misses: a 50-gram doc wholly pasted inside a
  // 500-gram doc scores J ≈ 0.1 (invisible to d02's 0.5 bar) but
  // containment |A∩B|/|A| = 1.0. Deduplicating training corpora needs
  // both grains — quote-expansion, boilerplate-wrapping, and
  // doc-in-doc aggregation all surface here and only here. Reported
  // per undirected candidate pair from the CONTAINED (smaller gram
  // set) side; ties break toward the smaller doc_id (x.doc_id <
  // y.doc_id keeps one row per pair in both engines).
  //
  // Scale shape: same inverted-index candidate generation as d02 —
  // gid equi-join on the shared [[sizedGids]] pin (exchange-free off
  // the cache), pair volume bounded by the [[autoDfCap]] Σ df²
  // budget. No size-ratio prefilter exists for containment (that
  // asymmetry is the operator's point: C≥t imposes no constraint on
  // n_b/n_a), so the cap is the ONLY pair-volume guard — which is
  // why it is derived from the observed df distribution rather than
  // fixed.
  private[queries] val ContainMin = 0.8
  val d15 = Q(
    "d15_containment",
    s"""$gidsCte,
      |h AS (SELECT doc_id, gid FROM g WHERE gid NOT IN
      |        (SELECT gid FROM g GROUP BY gid
      |         HAVING COUNT(*) > ${capSql("g")})),
      |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM h GROUP BY doc_id),
      |p AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |        CAST(COUNT(*) AS BIGINT) AS inter
      |      FROM h x JOIN h y ON x.gid = y.gid AND x.doc_id < y.doc_id
      |      GROUP BY 1, 2)
      |SELECT CASE WHEN na.n <= nb.n THEN doc_a ELSE doc_b END
      |    AS contained_doc,
      |  CASE WHEN na.n <= nb.n THEN doc_b ELSE doc_a END
      |    AS container_doc,
      |  inter, LEAST(na.n, nb.n) AS n_contained,
      |  CAST(inter AS DOUBLE) / LEAST(na.n, nb.n) AS containment
      |FROM p JOIN n na ON p.doc_a = na.doc_id
      |       JOIN n nb ON p.doc_b = nb.doc_id
      |WHERE CAST(inter AS DOUBLE) / LEAST(na.n, nb.n)
      |  >= $ContainMin""".stripMargin) { (s, dir) =>
    val par = s.sparkContext.defaultParallelism
    val hn = sizedGids(s, dir)
    hn.toDF("doc_a", "gid", "na")
      .join(hn.toDF("doc_b", "gid", "nb"), "gid")
      .filter(col("doc_a") < col("doc_b"))
      .repartition(par, col("doc_a"), col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"),
        max("na").as("na"), max("nb").as("nb"))
      .withColumn("n_contained", least(col("na"), col("nb")))
      .withColumn("containment",
        col("inter").cast(DoubleType) / col("n_contained"))
      .filter(col("containment") >= ContainMin)
      .select(
        when(col("na") <= col("nb"), col("doc_a")).otherwise(col("doc_b"))
          .as("contained_doc"),
        when(col("na") <= col("nb"), col("doc_b")).otherwise(col("doc_a"))
          .as("container_doc"),
        col("inter"), col("n_contained"), col("containment"))
  }

  // ---------------------------------------------------------------
  // d16 ensemble dedup consensus — the multi-detector vote real
  // pipelines run before destructive dedup: every candidate pair from
  // the four text detectors (d02 exact n-gram Jaccard, d15
  // containment, d03 MinHash bands, d04 SimHash hamming≤3) collapsed
  // to one row per undirected pair with a per-detector flag and the
  // agreement count. Pairs at n_detectors ≥ 2 are the high-confidence
  // drop set; single-detector pairs are each method's characteristic
  // tail (bands' false positives, containment's asymmetric
  // supersets). Single-sourced like d09/s11: Spark composes the
  // detectors' own run() plans, the oracle nests their SQL — the
  // ensemble cannot drift from its members.
  //
  // Scale shape (VERDICT r8 ask #1 — the tier swap is now CODE, not a
  // comment): the exact detectors' role is CORPUS-DERIVED. At
  // N ≤ [[EnsembleExactMax]] docs, d02/d15 GENERATE pairs from the
  // inverted index exactly as standalone (their Σ df² candidate
  // volume is linear-in-N by the autoDfCap budget, but the constant —
  // 481M shuffled candidate rows measured at the 500k-doc Heaps
  // corpus — dominates the ensemble). Above it, the hash detectors
  // (MinHash bands + auto-width SimHash pieces) generate the
  // candidates and the exact Jaccard/containment scores are computed
  // ONLY on those pairs via a pair-gram verification join (cand ⋈
  // grams-of-a ⋈ grams-of-b — volume is candidates × grams-per-doc,
  // linear in the hash tier's output, never Σ df²). The trade is the
  // documented LSH recall (d09 measures it): a pair detected ONLY by
  // exact Jaccard with no band/piece agreement is absent at the wide
  // tier. The tier predicate is one exact integer comparison on the
  // corpus doc count, mirrored in the oracle (both arms are stated in
  // the SQL, each gated by the predicate on the shared `tot` scalar),
  // so Spark and DuckDB flip tiers at the identical corpus.
  //
  // The consensus itself is unchanged: ONE union + one (doc_a, doc_b)
  // groupBy at flagged-pair grain, far below candidate grain.
  /** Docs threshold above which d16's exact detectors switch from
    * inverted-index pair GENERATION to hash-candidate VERIFICATION.
    * Test SFs (≤5k) and Heaps-10× (50k) sit below it — output
    * bit-identical to the historical composition; Heaps-100× (500k)
    * sits above. */
  private[queries] val EnsembleExactMax = 100000L
  val d16 = Q(
    "d16_ensemble_dups",
    s"""$mhSigCte,
      |gd AS (SELECT DISTINCT doc_id, gid FROM g),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM t
      |        WHERE len(ws) >= 3),
      |hh AS (SELECT doc_id, gid FROM gd WHERE gid NOT IN
      |        (SELECT gid FROM gd GROUP BY gid
      |         HAVING COUNT(*) > ${capSql("gd")})),
      |nn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
      |       FROM hh GROUP BY doc_id),
      |pp AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |        CAST(COUNT(*) AS BIGINT) AS inter
      |      FROM hh x JOIN hh y ON x.gid = y.gid AND x.doc_id < y.doc_id
      |        AND (SELECT nd FROM tot) <= $EnsembleExactMax
      |      GROUP BY 1, 2),
      |pj AS (SELECT doc_a, doc_b,
      |        CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jac,
      |        CAST(inter AS DOUBLE) / LEAST(na.n, nb.n) AS contain
      |      FROM pp JOIN nn na ON pp.doc_a = na.doc_id
      |              JOIN nn nb ON pp.doc_b = nb.doc_id),
      |sb AS (SELECT doc_id,
      |${(0 until 60).map(b =>
        s"        SUM(CASE WHEN (gid >> $b) & 1 = 1" +
          s" THEN 1 ELSE -1 END) AS s$b").mkString(",\n")}
      |       FROM gd GROUP BY doc_id),
      |sm AS (SELECT doc_id, CAST(
      |${(0 until 60).map(b =>
        s"        (CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)")
        .mkString(" +\n")}
      |        AS BIGINT) AS sh FROM sb),
      |sme AS (SELECT doc_id, sh % (SELECT $simhashW2Sql FROM tot)
      |          AS simhash FROM sm),
      |mhp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |        FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND
      |          $mhBandsSql),
      |shp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |        FROM sme a JOIN sme b ON a.doc_id < b.doc_id
      |        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      |cand AS (SELECT DISTINCT doc_a, doc_b FROM
      |          (SELECT doc_a, doc_b FROM mhp
      |           UNION ALL SELECT doc_a, doc_b FROM shp)),
      |civ AS (SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS inter
      |        FROM cand c JOIN hh x ON c.doc_a = x.doc_id
      |          AND (SELECT nd FROM tot) > $EnsembleExactMax
      |        JOIN hh y ON c.doc_b = y.doc_id AND x.gid = y.gid
      |        GROUP BY 1, 2),
      |cpj AS (SELECT civ.doc_a, civ.doc_b,
      |        CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jac,
      |        CAST(inter AS DOUBLE) / LEAST(na.n, nb.n) AS contain
      |      FROM civ JOIN nn na ON civ.doc_a = na.doc_id
      |              JOIN nn nb ON civ.doc_b = nb.doc_id),
      |exj AS (SELECT doc_a, doc_b, jac, contain FROM pj
      |        UNION ALL SELECT doc_a, doc_b, jac, contain FROM cpj),
      |allp AS (
      |  SELECT doc_a, doc_b, 'jaccard' AS det FROM exj
      |    WHERE jac >= $JaccardMin
      |  UNION ALL SELECT doc_a, doc_b, 'containment' FROM exj
      |    WHERE contain >= $ContainMin
      |  UNION ALL SELECT doc_a, doc_b, 'minhash' FROM mhp
      |  UNION ALL SELECT doc_a, doc_b, 'simhash' FROM shp)
      |SELECT doc_a, doc_b,
      |  MAX(CASE WHEN det = 'jaccard' THEN 1 ELSE 0 END) = 1
      |    AS by_jaccard,
      |  MAX(CASE WHEN det = 'containment' THEN 1 ELSE 0 END) = 1
      |    AS by_containment,
      |  MAX(CASE WHEN det = 'minhash' THEN 1 ELSE 0 END) = 1
      |    AS by_minhash,
      |  MAX(CASE WHEN det = 'simhash' THEN 1 ELSE 0 END) = 1
      |    AS by_simhash,
      |  CAST(MAX(CASE WHEN det = 'jaccard' THEN 1 ELSE 0 END)
      |    + MAX(CASE WHEN det = 'containment' THEN 1 ELSE 0 END)
      |    + MAX(CASE WHEN det = 'minhash' THEN 1 ELSE 0 END)
      |    + MAX(CASE WHEN det = 'simhash' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_detectors
      |FROM allp GROUP BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    def tag(df: DataFrame, det: String): DataFrame =
      df.select(col("doc_a"), col("doc_b"), lit(det).as("det"))
    val mh = tag(minhashPairs(s, dir), "minhash")
    val sh = tag(d04.run(s, dir), "simhash")
    // tier decision: ONE scalar driver sync (the d14 auto-k
    // precedent). It has to be plan-time: the two tiers differ in
    // JOIN STRUCTURE, which no runtime column can switch without
    // executing both arms. Served from the shared gids pin (filling
    // the cache every detector below reads) — no dedicated corpus
    // scan for the scalar.
    val nd = eligibleDocCount(s, dir)
    val exact =
      if (nd <= EnsembleExactMax) {
        val cont = d15.run(s, dir).select(
          least(col("contained_doc"), col("container_doc")).as("doc_a"),
          greatest(col("contained_doc"), col("container_doc")).as("doc_b"))
        tag(d02.run(s, dir), "jaccard")
          .unionByName(tag(cont, "containment"))
      } else {
        // wide tier: exact scores VERIFY the hash candidates. Both
        // hash frames feed the consensus AND this union — pin the
        // candidate set so bands/pieces run once; the pair-gram join
        // is candidates × grams-per-doc, keyed (doc, gid) against the
        // shared sizedGids pin.
        val hn = sizedGids(s, dir)
        val cand = Pin(mh.select("doc_a", "doc_b")
          .unionByName(sh.select("doc_a", "doc_b"))
          .distinct())
        val scored = cand
          .join(hn.toDF("doc_a", "gid", "na"), "doc_a")
          .join(hn.toDF("doc_b", "gid", "nb"), Seq("doc_b", "gid"))
          .groupBy("doc_a", "doc_b")
          .agg(count(lit(1)).as("inter"),
            max("na").as("na"), max("nb").as("nb"))
          .withColumn("jac", col("inter").cast(DoubleType) /
            (col("na") + col("nb") - col("inter")))
          .withColumn("contain",
            col("inter").cast(DoubleType) / least(col("na"), col("nb")))
        tag(scored.filter(col("jac") >= JaccardMin), "jaccard")
          .unionByName(
            tag(scored.filter(col("contain") >= ContainMin),
              "containment"))
      }
    val allp = exact.unionByName(mh).unionByName(sh)
    def flag(det: String) =
      max(when(col("det") === det, 1).otherwise(0))
    allp.groupBy("doc_a", "doc_b")
      .agg((flag("jaccard") === 1).as("by_jaccard"),
        (flag("containment") === 1).as("by_containment"),
        (flag("minhash") === 1).as("by_minhash"),
        (flag("simhash") === 1).as("by_simhash"),
        (flag("jaccard") + flag("containment") + flag("minhash") +
          flag("simhash")).cast(LongType).as("n_detectors"))
  }

  // ---------------------------------------------------------------
  // d17 delta dedup — the INCREMENTAL ingest shape production corpora
  // actually run: a new batch (doc_id % 10 = 9 here — the synthetic
  // stand-in for today's crawl) dedups against the EXISTING corpus
  // via fingerprint equi-join, never re-self-joining the corpus.
  // Per incoming doc: dup_existing (a corpus doc already has this
  // content), dup_batch (an earlier batch member does), or unique;
  // canonical_id is the election d01 would make, restricted to the
  // knowledge an incremental pass has.
  //
  // Scale shape — the whole point of the operator: the batch side is
  // SMALL relative to the corpus, so its distinct fingerprints
  // BROADCAST into a semi-restriction of the corpus scan BEFORE the
  // corpus-side min agg — corpus-grain work collapses to "docs whose
  // fingerprint appears in today's batch" (at 100 TB the existing
  // side is a precomputed fingerprint index; the plan is unchanged).
  // The semi-join is output-transparent: the oracle states the naive
  // corpus-wide agg and the results are identical.
  val d17 = Q(
    "d17_delta_dedup",
    """WITH d AS (SELECT doc_id, md5(text) AS fp FROM documents),
      |ex AS (SELECT fp, MIN(doc_id) AS ex_min FROM d
      |       WHERE doc_id % 10 <> 9 GROUP BY fp),
      |inc AS (SELECT doc_id, fp FROM d WHERE doc_id % 10 = 9),
      |bm AS (SELECT fp, MIN(doc_id) AS batch_min FROM inc GROUP BY fp)
      |SELECT i.doc_id, i.fp AS fingerprint,
      |  ex.ex_min AS dup_of_existing,
      |  CASE WHEN ex.ex_min IS NOT NULL THEN 'dup_existing'
      |       WHEN bm.batch_min < i.doc_id THEN 'dup_batch'
      |       ELSE 'unique' END AS status,
      |  COALESCE(ex.ex_min, bm.batch_min) AS canonical_id
      |FROM inc i LEFT JOIN ex ON i.fp = ex.fp
      |  JOIN bm ON i.fp = bm.fp""".stripMargin) { (s, dir) =>
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val inc = Pin(d.filter(col("doc_id") % 10 === 9))
    val incFps = inc.select("fp").distinct()
    val ex = d.filter(col("doc_id") % 10 =!= 9)
      .join(broadcast(incFps), "fp") // batch-driven semi-restriction
      .groupBy("fp").agg(min("doc_id").as("ex_min"))
    val bm = inc.groupBy("fp").agg(min("doc_id").as("batch_min"))
    inc.join(broadcast(ex), Seq("fp"), "left")
      .join(broadcast(bm), Seq("fp"))
      .select(col("doc_id"), col("fp").as("fingerprint"),
        col("ex_min").as("dup_of_existing"),
        when(col("ex_min").isNotNull, "dup_existing")
          .when(col("batch_min") < col("doc_id"), "dup_batch")
          .otherwise("unique").as("status"),
        coalesce(col("ex_min"), col("batch_min")).as("canonical_id"))
  }

  val all: Seq[Q] =
    Seq(d01, d02, d03, d04, d05, d06, d07, d08, d09, d10, d11, d12,
      d13, d15, d16, d17)
}
