package graft.queries

import graft.{Q, Tables}
import graft.functions.{Fns, VectorExprs}
import graft.operators.{ContextCompaction, Pin}
import graft.sources.TimerSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Oracle-checked queries exercising the ingest-side sources and
  * conversation-lifecycle operators (SURVEY §2.1 / §2.10 rows that
  * are operators, not connectors). */
object SourceQueries {

  // ---------------------------------------------------------------
  // s01 — timer schedule expansion (`agent_runtime.py:532+`,
  // `_make_timer`): every interval-timer fire instant in a fixed
  // 4-hour window, specs derived from `nation` (entry point per
  // nation, period (key mod 7)+1 minutes, immediate when key even).
  // The undrifted grid at epoch-ms precision — both engines expand
  // the same inclusive-bounds series.
  val s01 = Q(
    "s01_timer_ticks",
    """SELECT entry_point_id,
      |  CAST(epoch_ms(fire_at) AS BIGINT) AS fire_at_ms,
      |  'timer' AS source, 'scheduled' AS reason
      |FROM (
      |  SELECT n_name AS entry_point_id,
      |    unnest(generate_series(
      |      TIMESTAMP '2025-06-01 00:00:00'
      |        + (CASE WHEN n_nationkey % 2 = 0 THEN 0
      |                ELSE (n_nationkey % 7) + 1 END) * INTERVAL 1 MINUTE,
      |      TIMESTAMP '2025-06-01 04:00:00',
      |      ((n_nationkey % 7) + 1) * INTERVAL 1 MINUTE)) AS fire_at
      |  FROM nation)""".stripMargin) {
    (s, dir) =>
      val resolved = Tables.load(s, dir, "nation").select(
        col("n_name").as("entry_point_id"),
        lit(null).cast("string").as("cron"),
        ((col("n_nationkey") % 7) + 1).cast(DoubleType)
          .as("interval_minutes"),
        (col("n_nationkey") % 2 === 0).as("run_immediately"),
        lit(false).as("invalid"),
        lit(null).cast("long").as("m_min"),
        lit(null).cast("long").as("m_hour"),
        lit(null).cast("long").as("m_dom"),
        lit(null).cast("long").as("m_month"),
        lit(null).cast("long").as("m_dow"),
        lit(null).cast("boolean").as("dom_restricted"),
        lit(null).cast("boolean").as("dow_restricted"))
      TimerSource.ticks(resolved,
        java.sql.Timestamp.valueOf("2025-06-01 00:00:00"),
        java.sql.Timestamp.valueOf("2025-06-01 04:00:00"))
  }

  // ---------------------------------------------------------------
  // c01 — tier-1 context compaction (`conversation.py:416-508`,
  // `prune_old_tool_results`): events mapped onto the conversation
  // contract (user = conversation, click/view/error = tool results,
  // signup = assistant), reverse-budget prune marks + placeholder
  // rewrite, cross-checked value-for-value against the same window
  // algebra in DuckDB.
  val c01 = Q(
    "c01_prune_marks",
    """WITH c AS (
      |  SELECT user_id AS conv_id, event_id AS seq,
      |    CASE WHEN event_type IN ('click','view','error') THEN 'tool'
      |         WHEN event_type = 'signup' THEN 'assistant'
      |         ELSE 'user' END AS role,
      |    COALESCE(props, '') AS content,
      |    event_type = 'error' AS is_error
      |  FROM events),
      |e AS (SELECT *,
      |    role = 'tool' AND NOT is_error
      |      AND NOT starts_with(content, '[Pruned tool result')
      |      AS eligible,
      |    CAST(length(content) // 4 AS BIGINT) AS est
      |  FROM c),
      |w AS (SELECT *,
      |    COALESCE(SUM(CASE WHEN eligible THEN est ELSE 0 END) OVER (
      |      PARTITION BY conv_id ORDER BY seq DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS recent_est
      |  FROM e),
      |p AS (SELECT *, eligible AND recent_est >= 100 AS pruneable
      |  FROM w),
      |q AS (SELECT *,
      |    pruneable AND SUM(CASE WHEN pruneable THEN est ELSE 0 END)
      |      OVER (PARTITION BY conv_id) >= 50 AS pruned
      |  FROM p)
      |SELECT conv_id, seq, pruned,
      |  CASE WHEN NOT pruned THEN content
      |    WHEN regexp_extract(content, 'saved to ''([^'']+)''', 1) <> ''
      |    THEN '[Pruned tool result: '
      |      || CAST(length(content) AS VARCHAR)
      |      || ' chars. Full data in '''
      |      || regexp_extract(content, 'saved to ''([^'']+)''', 1)
      |      || '''. Use load_data('''
      |      || regexp_extract(content, 'saved to ''([^'']+)''', 1)
      |      || ''') to retrieve.]'
      |    ELSE '[Pruned tool result: '
      |      || CAST(length(content) AS VARCHAR)
      |      || ' chars cleared from context.]' END AS content
      |FROM q""".stripMargin) { (s, dir) =>
    val convFrame = Tables.load(s, dir, "events").select(
      col("user_id").as("conv_id"),
      col("event_id").as("seq"),
      when(col("event_type").isin("click", "view", "error"), "tool")
        .when(col("event_type") === "signup", "assistant")
        .otherwise("user").as("role"),
      coalesce(col("props"), lit("")).as("content"),
      (col("event_type") === "error").as("is_error"),
      lit(null).cast("string").as("phase_id"),
      lit(false).as("is_transition_marker"))
    ContextCompaction
      .pruneOldToolResults(convFrame, protectTokens = 100,
        minPruneTokens = 50)
      .select("conv_id", "seq", "pruned", "content")
  }

  // ---------------------------------------------------------------
  // s02 — deterministic train/val/test split assignment over the
  // document corpus (training-pipeline layer): hash-bucket on the
  // content-stable 60-bit id hash — retry-safe, growth-stable (an
  // existing doc never changes split as the corpus grows), zero
  // shuffles, and bit-identical in DuckDB via the same md5 prefix.
  val s02 = Q(
    "s02_split_assign",
    s"""SELECT doc_id, lang,
      |  CASE WHEN b IS NULL THEN NULL
      |       WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (SELECT doc_id, lang, ${Fns.hash60Sql("doc_id")} % 100 AS b
      |  FROM documents)""".stripMargin) { (s, dir) =>
    graft.operators.Sampling.assignSplits(
      Tables.load(s, dir, "documents").select("doc_id", "lang"),
      col("doc_id"),
      Seq("train" -> 80, "val" -> 90, "test" -> 100))
  }

  // ---------------------------------------------------------------
  // s03 — exact-fraction stratified sample: the first ceil(0.2·n)
  // docs of every language in (hash, id) order. One window shuffle on
  // the stratum key; exact per-stratum proportions a bucket filter
  // only approximates on small strata.
  val s03 = Q(
    "s03_stratified_sample",
    s"""WITH h AS (SELECT doc_id, lang, ${Fns.hash60Sql("doc_id")} AS hv,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM documents),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
      |        ORDER BY hv, doc_id) AS rn FROM h)
      |SELECT doc_id, lang FROM r
      |WHERE rn <= CAST(ceil(round(0.2 * n, 6)) AS BIGINT)""".stripMargin) {
    (s, dir) =>
      graft.operators.Sampling.stratifiedSample(
        Tables.load(s, dir, "documents").select("doc_id", "lang"),
        col("doc_id"), col("lang"), 0.2)
  }

  // ---------------------------------------------------------------
  // s04 — train/test contamination at the NEAR-dup grain: held-out
  // docs whose winnowing fingerprint (d05's 1-permutation MinHash)
  // also appears in the train split — fuzzy duplicates straddling the
  // s02 assignment leak eval data into training, which is exactly
  // what real decontamination passes look for (exact-text collisions
  // are the easy subset; this corpus has none). One fingerprint
  // groupBy + one equi-join — the d01/d05 shuffle shape. Docs under
  // 3 tokens have no fingerprint and are out of contamination scope.
  val s04 = Q(
    "s04_contamination",
    s"""${TextDedup.gidsRawCte},
      |fp AS (SELECT doc_id, MIN(gid) AS fp FROM g GROUP BY doc_id),
      |a AS (SELECT d.doc_id, d.lang, fp.fp,
      |    CASE WHEN ${Fns.hash60Sql("d.doc_id")} % 100 < 80
      |         THEN 'train' ELSE 'test' END AS split
      |  FROM documents d JOIN fp ON d.doc_id = fp.doc_id),
      |tr AS (SELECT fp, COUNT(*) AS n_train_dups FROM a
      |       WHERE split = 'train' GROUP BY fp)
      |SELECT a.doc_id, a.lang, a.split, tr.n_train_dups
      |FROM a JOIN tr ON a.fp = tr.fp WHERE a.split = 'test'""".stripMargin) {
    (s, dir) =>
      val fp = TextDedup.gids(s, dir, distinct = false)
        .groupBy("doc_id").agg(min(col("gid")).as("fp"))
      val docs = Tables.load(s, dir, "documents")
        .select("doc_id", "lang").join(fp, "doc_id")
      val assigned = graft.operators.Sampling.assignSplits(
        docs, col("doc_id"), Seq("train" -> 80, "test" -> 100))
      graft.operators.Sampling
        .contamination(assigned, col("fp"), hashKey = false)
        .select("doc_id", "lang", "split", "n_train_dups")
  }

  // ---------------------------------------------------------------
  // s05 — sequence-packing offsets (training-pipeline layer): docs
  // concatenate in (shard, doc_id) order and cut into 2048-token
  // sequences; each doc reports where its text starts (sequence index
  // + offset — simple concat-packing, a doc may straddle a boundary).
  // 32 shards = 32 independent window partitions: the packing
  // parallelizes at any corpus size, and the only shuffle is the
  // shard-keyed sort.
  val s05 = Q(
    "s05_pack_assign",
    """WITH t AS (SELECT doc_id, doc_id % 32 AS shard,
      |    len(string_split(text,' ')) AS n_tokens FROM documents),
      |c AS (SELECT doc_id, shard, n_tokens,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
      |      - n_tokens AS BIGINT) AS start_pos FROM t)
      |SELECT doc_id, shard, n_tokens, start_pos,
      |  start_pos // 2048 AS seq_index,
      |  start_pos % 2048 AS seq_offset
      |FROM c""".stripMargin) { (s, dir) =>
    graft.operators.Sampling.packSequences(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(Fns.tokens(col("text"))).cast(LongType).as("n_tokens")),
      col("doc_id"), col("n_tokens"), shards = 32, capacity = 2048L)
      .select("doc_id", "shard", "n_tokens", "start_pos",
        "seq_index", "seq_offset")
  }

  // ---------------------------------------------------------------
  // s06 — train/eval decontamination at the SHARED-N-GRAM grain (the
  // GPT-3/PaLM-style direct-overlap check, complementing s04's
  // fingerprint grain): for every (eval doc, train doc) pair sharing
  // ≥3 distinct word-3-gram shingles, the shared-gram count and the
  // fraction of the eval doc's grams covered. Candidates come from an
  // inverted-index equi-join on the 60-bit gram hash (never all
  // pairs), with d02's distribution-derived document-frequency cap
  // ([[TextDedup.autoDfCap]]) as the
  // hub-gram skew guard — the d02 shuffle shape, so it survives the
  // same 100 TB growth.
  val s06 = Q(
    "s06_decontamination",
    s"""${TextDedup.gidsCte},
      |h AS (SELECT doc_id, gid FROM g WHERE gid NOT IN
      |        (SELECT gid FROM g GROUP BY gid HAVING COUNT(*) > ${TextDedup.capSql("g")})),
      |a AS (SELECT doc_id, gid,
      |    CASE WHEN ${Fns.hash60Sql("doc_id")} % 100 < 80
      |         THEN 'train' ELSE 'eval' END AS split FROM h),
      |n AS (SELECT doc_id, COUNT(*) AS n_grams FROM a
      |      WHERE split = 'eval' GROUP BY doc_id),
      |p AS (SELECT ev.doc_id AS eval_doc_id, tr.doc_id AS train_doc_id,
      |        CAST(COUNT(*) AS BIGINT) AS shared_grams
      |      FROM a ev JOIN a tr ON ev.gid = tr.gid
      |      WHERE ev.split = 'eval' AND tr.split = 'train'
      |      GROUP BY 1, 2)
      |SELECT p.eval_doc_id, p.train_doc_id, p.shared_grams,
      |  n.n_grams AS eval_grams,
      |  CAST(p.shared_grams AS DOUBLE) / n.n_grams AS overlap_frac
      |FROM p JOIN n ON p.eval_doc_id = n.doc_id
      |WHERE p.shared_grams >= 3""".stripMargin) { (s, dir) =>
    // distinct grams per doc (overlap counts pairs of DISTINCT grams);
    // the df-capped, pinned, gid-pre-partitioned gram relation is
    // d02's OWN [[TextDedup.cappedGids]] — identical plan, so the
    // cache manager dedups and the eval⋈train join below inherits the
    // gid partitioning through the split/filter (exchange-free join).
    val h = TextDedup.cappedGids(s, dir)
    // the split rule is s02/s04's assignSplits — ONE definition of the
    // 80/20 hash bucket, so contamination queries can never drift from
    // the split they are supposed to audit
    val a = graft.operators.Sampling.assignSplits(
      h, col("doc_id"), Seq("train" -> 80, "eval" -> 100))
    val ev = a.filter(col("split") === "eval")
      .select(col("doc_id").as("eval_doc_id"), col("gid"))
    val tr = a.filter(col("split") === "train")
      .select(col("doc_id").as("train_doc_id"), col("gid"))
    val n = ev.groupBy("eval_doc_id").agg(count(lit(1)).as("eval_grams"))
    // candidate pairs ≈ unique (eval, train) groups — little map-side
    // reduction, so the pair agg is the widest stage; d02's
    // parallelism floor keeps it off one core when AQE's size-first
    // coalescing sees a small exchange (no-op at scale)
    val par = s.sparkContext.defaultParallelism
    ev.join(tr, "gid")
      .repartition(par, col("eval_doc_id"), col("train_doc_id"))
      .groupBy("eval_doc_id", "train_doc_id")
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= 3)
      .join(n, "eval_doc_id")
      .select(col("eval_doc_id"), col("train_doc_id"),
        col("shared_grams"), col("eval_grams"),
        (col("shared_grams").cast(DoubleType) / col("eval_grams"))
          .as("overlap_frac"))
  }

  // ---------------------------------------------------------------
  // s07 — temperature-resampled language mix (the multilingual
  // rebalancing step of an mC4/ROOTS-style corpus: upsample tails,
  // downsample the head): per-language token counts → sampling shares
  // ∝ n^α with α = 0.5, i.e. sqrt — IEEE-exact and correctly rounded,
  // so both engines agree bit-for-bit, unlike pow(x, 0.3). The sqrt
  // weights fold through 1e9-scaled BIGINTs summed as integers
  // (order-independent); only the final share divisions run in double.
  // One groupBy on lang — driver-scale output at any corpus size.
  val s07 = Q(
    "s07_language_mix",
    """WITH a AS (SELECT lang, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang),
      |s AS (SELECT *,
      |    CAST(round(sqrt(n_tokens::DOUBLE) * 1e9) AS BIGINT) AS sw
      |  FROM a)
      |SELECT lang, n_docs, n_tokens,
      |  n_tokens::DOUBLE / CAST((SELECT SUM(n_tokens) FROM a) AS BIGINT)
      |    AS natural_share,
      |  sw::DOUBLE / CAST((SELECT SUM(sw) FROM s) AS BIGINT)
      |    AS resampled_share,
      |  (sw::DOUBLE / CAST((SELECT SUM(sw) FROM s) AS BIGINT)) /
      |    (n_tokens::DOUBLE / CAST((SELECT SUM(n_tokens) FROM a) AS BIGINT))
      |    AS upsample_factor
      |FROM s""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val a = Tables.load(s, dir, "documents")
      .select(col("lang"), size(Fns.tokens(col("text"))).as("nt"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt").cast(LongType)).as("n_tokens"))
      .withColumn("sw",
        round(sqrt(col("n_tokens").cast(DoubleType)) * lit(1e9))
          .cast(LongType))
    // totals via an unpartitioned window: fine here because the input
    // is ALREADY one row per language (driver-scale cardinality)
    val w = Window.partitionBy()
    val natural =
      col("n_tokens").cast(DoubleType) / sum("n_tokens").over(w)
    val resampled = col("sw").cast(DoubleType) / sum("sw").over(w)
    a.select(col("lang"), col("n_docs"), col("n_tokens"),
      natural.as("natural_share"), resampled.as("resampled_share"),
      (resampled / natural).as("upsample_factor"))
  }

  // ---------------------------------------------------------------
  // s08 — token-budget quota sampling (the data-mixing cap: at most
  // 2000 tokens of each source make the mix): docs taken in
  // deterministic (hash, id) order until the source's cumulative
  // token count crosses the budget. One window shuffle on the source
  // key; the hash order makes the take a sample, not an ingestion
  // prefix.
  val s08 = Q(
    "s08_token_budget",
    s"""WITH h AS (SELECT doc_id, source,
      |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
      |    ${Fns.hash60Sql("doc_id")} AS hv
      |  FROM documents),
      |c AS (SELECT doc_id, source, n_tokens,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY source
      |      ORDER BY hv, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_weight
      |  FROM h)
      |SELECT doc_id, source, n_tokens, cum_weight
      |FROM c WHERE cum_weight <= 2000""".stripMargin) { (s, dir) =>
    graft.operators.Sampling.takeWeightBudget(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(Fns.tokens(col("text"))).cast(LongType).as("n_tokens")),
      col("doc_id"), col("source"), col("n_tokens"), budget = 2000L)
      .select("doc_id", "source", "n_tokens", "cum_weight")
  }

  // ---------------------------------------------------------------
  // s09 — train/eval contamination at the SEMANTIC grain, completing
  // the decontamination triple (s04 fingerprint, s06 shared-n-gram,
  // s09 embedding cosine): cross-split pairs among d06's verified
  // near-duplicates, oriented as (eval vec, train vec). Both sides
  // literally reuse d06 — the Spark side runs its plan, the oracle
  // nests its SQL as a CTE — so the semantic-duplicate definition
  // (blocking cells, cosine threshold) can never drift from the dedup
  // operator users already trust. Split rule = s02's hash bucket via
  // the same single-sourced fragments.
  val s09 = Q(
    "s09_semantic_contamination",
    s"""WITH base AS (${TextDedup.d06.oracle.get}),
      |sp AS (SELECT vec_a, vec_b, label, cosine,
      |  CASE WHEN ${Fns.hash60Sql("vec_a")} % 100 < 80
      |       THEN 'train' ELSE 'eval' END AS split_a,
      |  CASE WHEN ${Fns.hash60Sql("vec_b")} % 100 < 80
      |       THEN 'train' ELSE 'eval' END AS split_b
      |  FROM base)
      |SELECT CASE WHEN split_a = 'eval' THEN vec_a ELSE vec_b END
      |    AS eval_vec_id,
      |  CASE WHEN split_a = 'eval' THEN vec_b ELSE vec_a END
      |    AS train_vec_id,
      |  label, cosine
      |FROM sp WHERE split_a <> split_b""".stripMargin) { (s, dir) =>
    val base = TextDedup.d06.run(s, dir)
    val sA = graft.operators.Sampling
      .assignSplits(base, col("vec_a"), Seq("train" -> 80, "eval" -> 100))
      .withColumnRenamed("split", "split_a")
    val sB = graft.operators.Sampling
      .assignSplits(sA, col("vec_b"), Seq("train" -> 80, "eval" -> 100))
      .withColumnRenamed("split", "split_b")
    sB.filter(col("split_a") =!= col("split_b"))
      .select(
        when(col("split_a") === "eval", col("vec_a")).otherwise(col("vec_b"))
          .as("eval_vec_id"),
        when(col("split_a") === "eval", col("vec_b")).otherwise(col("vec_a"))
          .as("train_vec_id"),
        col("label"), col("cosine"))
  }

  // ---------------------------------------------------------------
  // s10 — source mixture weights with repeat caps (the data-budget
  // allocation step of a data-constrained run, Muennighoff et al.
  // 2023: repeating data beyond ~4 epochs stops helping): per-source
  // token counts → temperature-resampled mix shares (s07's IEEE-exact
  // sqrt idiom, α = 0.5, over SOURCE instead of language), a total
  // token budget of 2× the corpus allocated by share, and the
  // per-source epoch count that allocation implies, capped at 4
  // epochs — effective_tokens < target_tokens is the "this source is
  // exhausted, re-weight the rest" signal. Double arithmetic appears
  // only in ops both engines round identically (one div, one mul,
  // round/floor on positives), in the SAME written order on both
  // sides. One groupBy on source — driver-scale output at any corpus
  // size.
  val s10 = Q(
    "s10_mixture_weights",
    """WITH a AS (SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |s AS (SELECT *,
      |    CAST(round(sqrt(n_tokens::DOUBLE) * 1e6) AS BIGINT) AS sw
      |  FROM a),
      |t AS (SELECT source, n_docs, n_tokens,
      |    sw::DOUBLE / CAST((SELECT SUM(sw) FROM s) AS BIGINT) AS share,
      |    CAST(2 * (SELECT SUM(n_tokens) FROM a) AS BIGINT) AS budget
      |  FROM s),
      |u AS (SELECT source, n_docs, n_tokens, share,
      |    CAST(round(budget::DOUBLE * share) AS BIGINT) AS target_tokens
      |  FROM t)
      |SELECT source, n_docs, n_tokens, share AS mix_share,
      |  target_tokens,
      |  CAST(LEAST(400, CAST(floor(target_tokens::DOUBLE * 100.0
      |      / n_tokens::DOUBLE) AS BIGINT)) AS BIGINT) AS epochs_x100,
      |  CAST(LEAST(target_tokens, 4 * n_tokens) AS BIGINT)
      |    AS effective_tokens
      |FROM u""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val a = Tables.load(s, dir, "documents")
      .select(col("source"), size(Fns.tokens(col("text"))).as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt").cast(LongType)).as("n_tokens"))
      .withColumn("sw",
        round(sqrt(col("n_tokens").cast(DoubleType)) * lit(1e6))
          .cast(LongType))
    // unpartitioned-window totals: input is one row per source
    // (driver-scale), same rationale as s07
    val w = Window.partitionBy()
    val share = col("sw").cast(DoubleType) / sum("sw").over(w)
    val budget = (sum("n_tokens").over(w) * lit(2L)).cast(LongType)
    val target = round(budget.cast(DoubleType) * share).cast(LongType)
    a.select(col("source"), col("n_docs"), col("n_tokens"),
      share.as("mix_share"), target.as("target_tokens"),
      least(lit(400L),
        floor(target.cast(DoubleType) * lit(100.0)
          / col("n_tokens").cast(DoubleType)).cast(LongType))
        .as("epochs_x100"),
      least(target, col("n_tokens") * lit(4L)).as("effective_tokens"))
  }

  // ---------------------------------------------------------------
  // s11 end-to-end curation report — the composition a user of the
  // engine actually runs: near-dup clusters drop their non-canonical
  // members (d07's OWN plan), the survivors pass the Gopher quality
  // gate (t09's plan), and what remains is split-assigned (s02's
  // plan) — reported per (split, source) with kept-token totals.
  // Single-sourced like s09/v06/d09: Spark composes the operators'
  // run() outputs and the oracle nests their oracle SQL as CTEs, so
  // the composition cannot drift from the components. Removal
  // precedence: duplicate first, then quality; a NULL quality verdict
  // (t09's empty-text guard) falls through to 'kept' in BOTH engines
  // (CASE skips null conditions).
  //
  // Scale shape: three doc_id equi-joins over per-doc relations —
  // each component is already scale-audited; the report adds one
  // (split, source)-grain aggregate.
  val s11 = Q(
    "s11_curation_report",
    s"""WITH dup AS (${TextDedup.d07.oracle.get}),
      |qf AS (${TextAnalysis.t09.oracle.get}),
      |sp AS (${s02.oracle.get}),
      |base AS (SELECT doc_id, source,
      |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_toks
      |  FROM documents),
      |j AS (SELECT base.doc_id, base.source, base.n_toks, sp.split,
      |    CASE WHEN dup.doc_id IS NOT NULL AND NOT dup.is_canonical
      |           THEN 'dup'
      |         WHEN NOT qf.keep THEN 'quality'
      |         ELSE 'kept' END AS status
      |  FROM base JOIN sp ON base.doc_id = sp.doc_id
      |    JOIN qf ON base.doc_id = qf.doc_id
      |    LEFT JOIN dup ON base.doc_id = dup.doc_id)
      |SELECT split, source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  CAST(SUM(CASE WHEN status = 'dup' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed_dup,
      |  CAST(SUM(CASE WHEN status = 'quality' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_removed_quality,
      |  CAST(SUM(CASE WHEN status = 'kept' THEN n_toks ELSE 0 END)
      |    AS BIGINT) AS tokens_kept
      |FROM j GROUP BY split, source""".stripMargin) { (s, dir) =>
    val dup = TextDedup.d07.run(s, dir)
      .select(col("doc_id"), col("is_canonical"))
    val qf = TextAnalysis.t09.run(s, dir).select(col("doc_id"), col("keep"))
    val sp = s02.run(s, dir).select(col("doc_id"), col("split"))
    val base = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(Fns.tokens(col("text"))).cast(LongType).as("n_toks"))
    val status =
      when(col("is_canonical").isNotNull && !col("is_canonical"), "dup")
        .when(!col("keep"), "quality")
        .otherwise("kept")
    base.join(sp, "doc_id").join(qf, "doc_id")
      .join(dup, Seq("doc_id"), "left")
      .withColumn("status", status)
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("status") === "kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("status") === "dup", 1L).otherwise(0L))
          .as("n_removed_dup"),
        sum(when(col("status") === "quality", 1L).otherwise(0L))
          .as("n_removed_quality"),
        sum(when(col("status") === "kept", col("n_toks")).otherwise(0L))
          .as("tokens_kept"))
  }

  // ---------------------------------------------------------------
  // s12 canary / leak scan — the exact-substring contamination grain
  // the s-family was missing (s04 = fingerprint, s06 = n-gram
  // overlap, s09 = semantic): given a bounded set of canary strings
  // (eval answers, secrets, injected memorization probes), report per
  // canary how many documents contain it verbatim, total occurrence
  // count, and the smallest matching doc_id as the audit entry point.
  // Occurrences count by exact substring arithmetic —
  // (len(text) − len(replace(text, canary, ''))) / len(canary) — an
  // integer in both engines (replace removes non-overlapping matches
  // left-to-right in both).
  //
  // Scale shape: a single corpus scan; the canary set broadcasts as
  // an exploded literal array (rows = docs × |canaries|, all narrow);
  // the report aggregate is |canaries|-bounded. Zero-hit canaries
  // still report on any non-empty corpus (the grouping spine is
  // docs × canaries, not the matches) — "no leak found" must be a
  // row with NULL first_doc_id, not an absence.
  private val Canaries =
    Seq("table part a", "scan query big", "value fast spark",
      "canary-724-never-in-corpus")
  val s12 = Q(
    "s12_canary_scan",
    s"""WITH cs AS (SELECT unnest([${Canaries
        .map(c => s"'${c.replace("'", "''")}'")
        .mkString(",")}]) AS canary),
      |m AS (SELECT cs.canary, d.doc_id,
      |    CAST((len(d.text) - len(replace(d.text, cs.canary, '')))
      |      / len(cs.canary) AS BIGINT) AS occ
      |  FROM documents d CROSS JOIN cs)
      |SELECT canary,
      |  CAST(SUM(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_docs,
      |  CAST(SUM(occ) AS BIGINT) AS n_occurrences,
      |  MIN(CASE WHEN occ > 0 THEN doc_id END) AS first_doc_id
      |FROM m GROUP BY canary""".stripMargin) { (s, dir) =>
    val occ = ((length(col("text")) -
      length(replace(col("text"), col("canary")))) /
      length(col("canary"))).cast(LongType)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(typedlit(Canaries)).as("canary"))
      .select(col("canary"), col("doc_id"), occ.as("occ"))
      .groupBy("canary")
      .agg(sum(when(col("occ") > 0, 1L).otherwise(0L)).as("n_docs"),
        sum("occ").as("n_occurrences"),
        min(when(col("occ") > 0, col("doc_id"))).as("first_doc_id"))
  }

  // ---------------------------------------------------------------
  // s13 DSIR importance weights (Xie et al. 2023, arXiv:2302.03169,
  // "Data Selection for Language Models via Importance Resampling") —
  // the weight-and-select primitive for steering a corpus toward a
  // target distribution: per document, the log importance ratio
  // log p_target(x)/p_source(x) under bag-of-hashed-bigram unigram
  // models (the paper's feature space), here with target = the
  // English slice and source = the whole corpus. Bigrams hash to
  // 8192 buckets (the paper's bounded feature space), counts get
  // add-one smoothing, and the log runs in the inventory's integer
  // floor-log2 bits — so the whole weight is exact integer algebra:
  //   Σ_bkt dc·(bits(ct+1) − bits(cs+1) + bits(Ns) − bits(Nt)).
  // Selection is a deterministic per-source top-10 by (weight,
  // doc_id) — the Gumbel resampling step made reproducible, with the
  // per-domain quota keeping the rank window partitioned.
  //
  // Scale shape: the corpus collapses ONCE to (doc, source, lang,
  // bucket, count) — pinned; both models aggregate to ≤8192 rows by
  // construction (the hashing trick's whole point) and BROADCAST into
  // the scoring join, so the only corpus-cardinality shuffles are the
  // bucket collapse, the per-doc score agg, and the per-source rank
  // window. No vocabulary-size term anywhere.
  private val DsirBuckets = 8192
  private val DsirQuota = 10
  val s13 = Q(
    "s13_dsir_weights",
    s"""WITH d AS (SELECT doc_id, lang, source, string_split(text,' ') AS t
      |       FROM documents),
      |bg AS (SELECT doc_id, lang, source, bh % $DsirBuckets AS bkt,
      |    CAST(COUNT(*) AS BIGINT) AS dc
      |  FROM (SELECT doc_id, lang, source,
      |      unnest(list_transform(range(1, len(t)),
      |        i -> ${Fns.hash60Sql("t[i] || ' ' || t[i+1]")})) AS bh
      |    FROM d)
      |  GROUP BY doc_id, lang, source, bh % $DsirBuckets),
      |tm AS (SELECT bkt, CAST(SUM(dc) AS BIGINT) AS ct FROM bg
      |       WHERE lang = 'en' GROUP BY bkt),
      |sm AS (SELECT bkt, CAST(SUM(dc) AS BIGINT) AS cs FROM bg
      |       GROUP BY bkt),
      |tot AS (SELECT CAST(SUM(CASE WHEN lang = 'en' THEN dc ELSE 0 END)
      |          AS BIGINT) AS nt,
      |        CAST(SUM(dc) AS BIGINT) AS ns FROM bg),
      |sc AS (SELECT bg.doc_id, bg.source,
      |    CAST(SUM(bg.dc) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(bg.dc * (length(bin(COALESCE(tm.ct, 0) + 1))
      |      - length(bin(sm.cs + 1))
      |      + length(bin(tot.ns)) - length(bin(tot.nt))))
      |      AS BIGINT) AS log_ratio_bits
      |  FROM bg JOIN sm ON bg.bkt = sm.bkt
      |    LEFT JOIN tm ON bg.bkt = tm.bkt CROSS JOIN tot
      |  GROUP BY bg.doc_id, bg.source)
      |SELECT doc_id, source, n_bigrams, log_ratio_bits, sel_rank,
      |  sel_rank <= $DsirQuota AS selected
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
      |    ORDER BY log_ratio_bits DESC, doc_id) AS sel_rank FROM sc)
      |  z""".stripMargin) { (s, dir) =>
    val bg = graft.operators.Pin(Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        explode(VectorExprs.gram2PairHash60(Fns.tokens(col("text"))))
          .as("p"))
      .select(col("doc_id"), col("lang"), col("source"),
        (col("p.b") % DsirBuckets).as("bkt"))
      .groupBy("doc_id", "lang", "source", "bkt")
      .agg(count(lit(1)).as("dc")))
    val tm = bg.filter(col("lang") === "en")
      .groupBy("bkt").agg(sum("dc").as("ct"))
    val sm = bg.groupBy("bkt").agg(sum("dc").as("cs"))
    val tot = bg.agg(
      sum(when(col("lang") === "en", col("dc")).otherwise(0L)).as("nt"),
      sum("dc").as("ns"))
    def bits(c: org.apache.spark.sql.Column) =
      length(bin(c)).cast(LongType)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("log_ratio_bits").desc, col("doc_id"))
    bg.join(broadcast(sm), "bkt")
      .join(broadcast(tm), Seq("bkt"), "left")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id", "source")
      .agg(sum("dc").as("n_bigrams"),
        sum(col("dc") * (bits(coalesce(col("ct"), lit(0L)) + 1)
          - bits(col("cs") + 1) + bits(col("ns")) - bits(col("nt"))))
          .as("log_ratio_bits"))
      .withColumn("sel_rank", row_number().over(w))
      .select(col("doc_id"), col("source"), col("n_bigrams"),
        col("log_ratio_bits"), col("sel_rank"),
        (col("sel_rank") <= DsirQuota).as("selected"))
  }

  // ---------------------------------------------------------------
  // s14 context-window chunking — the doc→training-sequence splitter
  // every LM data pipeline runs between curation and tokenizer
  // packing (the upstream half of s05's sequence packing): each
  // document becomes overlapping windows of [[ChunkTokens]] tokens
  // advancing by [[ChunkStride]] (16-token overlap preserves
  // cross-boundary context, the standard long-doc chunking scheme).
  // A trailing fragment shorter than [[ChunkMinTail]] is dropped —
  // it is already ≥(ChunkTokens−ChunkStride) covered by the previous
  // window — unless it is the document's ONLY chunk.
  //
  // Scale shape: pure narrow per-row compute — split, explode the
  // start grid (sequence()), slice — ZERO shuffle at any corpus
  // size; the chunker runs where the documents live and the output
  // is immediately partition-local input to the pack/tokenize stage.
  // Chunk text re-materializes ~4/3× the corpus bytes (the overlap
  // tax), which is the operator's semantics, not a plan artifact.
  private val ChunkTokens = 64
  private val ChunkStride = 48
  private val ChunkMinTail = 16
  val s14 = Q(
    "s14_chunk_windows",
    s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS ws
      |           FROM documents),
      |c AS (SELECT doc_id, ws, i AS tok_start
      |      FROM t, LATERAL unnest(range(0, len(ws), $ChunkStride))
      |        AS u(i))
      |SELECT doc_id,
      |  CAST(tok_start // $ChunkStride AS BIGINT) AS chunk_id,
      |  CAST(tok_start AS BIGINT) AS tok_start,
      |  CAST(LEAST(tok_start + $ChunkTokens, len(ws)) AS BIGINT)
      |    AS tok_end,
      |  CAST(LEAST(tok_start + $ChunkTokens, len(ws)) - tok_start
      |    AS BIGINT) AS n_tokens,
      |  array_to_string(
      |    ws[tok_start + 1 : LEAST(tok_start + $ChunkTokens, len(ws))],
      |    ' ') AS chunk_text
      |FROM c WHERE tok_start = 0
      |  OR LEAST(tok_start + $ChunkTokens, len(ws)) - tok_start
      |    >= $ChunkMinTail""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0), size(col("ws")) - 1,
          lit(ChunkStride))).as("tok_start"))
      .withColumn("tok_end",
        least(col("tok_start") + ChunkTokens, size(col("ws"))))
      .withColumn("n_tokens", col("tok_end") - col("tok_start"))
      .filter(col("tok_start") === 0 ||
        col("n_tokens") >= ChunkMinTail)
      .select(col("doc_id"),
        (col("tok_start") / ChunkStride).cast(LongType).as("chunk_id"),
        col("tok_start").cast(LongType).as("tok_start"),
        col("tok_end").cast(LongType).as("tok_end"),
        col("n_tokens").cast(LongType).as("n_tokens"),
        array_join(slice(col("ws"), col("tok_start") + 1,
          col("n_tokens")), " ").as("chunk_text"))
  }

  // ---------------------------------------------------------------
  // s15 epoch repetition schedule — the data-constrained-scaling
  // practice (Muennighoff et al. 2023, arXiv:2305.16264): repeat
  // higher-quality documents for more training epochs instead of
  // scraping more data. Tiers are exact integer rules on the doc
  // itself (length + vocabulary-diversity ratio); each doc explodes
  // into (doc_id, epoch) rows, and every epoch gets a DETERMINISTIC
  // shuffLED training order via md5(doc_id:epoch) — reproducible
  // across runs, uncorrelated across epochs (the per-epoch reshuffle
  // every training loop wants).
  //
  // Scale shape: train_pos is a per-epoch TOTAL order — the one
  // inherently global thing a training schedule needs. It is computed
  // two-level so no task ever sees an epoch's whole corpus: a
  // row_number within (epoch, shard := first shuffle_key byte-pair;
  // 256 shards/epoch) plus a broadcast prefix-sum of shard counts
  // (epochs×256 rows). Ordering by shuffle_key within shard = ordering
  // by (shard, shuffle_key) globally, since the shard IS the key's
  // prefix — identical output to the single-window formulation the
  // oracle uses, without its single-partition window.
  val s15 = Q(
    "s15_epoch_schedule",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS ws
      |           FROM documents),
      |f AS (SELECT doc_id, len(ws) AS n_words,
      |        len(list_distinct(ws)) AS n_distinct FROM t),
      |r AS (SELECT doc_id,
      |        CASE WHEN n_words >= 40 AND n_distinct*2 >= n_words
      |               THEN 3
      |             WHEN n_words >= 20 THEN 2 ELSE 1 END AS n_epochs
      |      FROM f),
      |x AS (SELECT doc_id, n_epochs,
      |        unnest(range(1, n_epochs + 1)) AS epoch FROM r),
      |k AS (SELECT doc_id, n_epochs, epoch,
      |        md5(doc_id::VARCHAR || ':' || epoch::VARCHAR)
      |          AS shuffle_key FROM x)
      |SELECT doc_id, CAST(epoch AS BIGINT) AS epoch,
      |  CAST(n_epochs AS BIGINT) AS n_epochs, shuffle_key,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch
      |    ORDER BY shuffle_key, doc_id) AS BIGINT) AS train_pos
      |FROM k""".stripMargin) { (s, dir) =>
    val ws = split(col("text"), " ")
    val nEpochs = when(size(col("ws")) >= 40 &&
        size(array_distinct(col("ws"))) * 2 >= size(col("ws")), 3)
      .when(size(col("ws")) >= 20, 2).otherwise(1)
    val x = graft.operators.Pin(Tables.load(s, dir, "documents")
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), nEpochs.as("n_epochs"))
      .select(col("doc_id"), col("n_epochs"),
        explode(sequence(lit(1), col("n_epochs"))).as("epoch"))
      .withColumn("shuffle_key",
        md5(concat(col("doc_id").cast(StringType), lit(":"),
          col("epoch").cast(StringType))))
      .withColumn("shard", substring(col("shuffle_key"), 1, 2)))
    val offsets = x.groupBy("epoch", "shard")
      .agg(count(lit(1)).as("c"))
      .withColumn("offset",
        sum("c").over(org.apache.spark.sql.expressions.Window
          .partitionBy("epoch").orderBy("shard")) - col("c"))
      .select("epoch", "shard", "offset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("epoch", "shard").orderBy("shuffle_key", "doc_id")
    x.withColumn("pos_in_shard", row_number().over(w))
      .join(broadcast(offsets), Seq("epoch", "shard"))
      .select(col("doc_id"), col("epoch").cast(LongType).as("epoch"),
        col("n_epochs").cast(LongType).as("n_epochs"),
        col("shuffle_key"),
        (col("offset") + col("pos_in_shard")).cast(LongType)
          .as("train_pos"))
  }

  // ---------------------------------------------------------------
  // s16 decontamination APPLY — the materialization step downstream
  // of s06's detection (the d07→d10 detect→apply symmetry, on the
  // train/eval axis): every document gets its split, its
  // contamination verdict, and the action an eval-set build would
  // take — eval docs overlapping any train doc at ≥ [[ContamFrac]]
  // of their grams are QUARANTINED (excluded from eval, the GPT-3
  // appendix-C move), everything else keeps. Single-sourced: Spark
  // filters s06's own run() output; the oracle nests s06's SQL — the
  // quarantine set cannot drift from the detector.
  //
  // Scale shape: s06's audited inverted-index join does the heavy
  // work (shared cappedGids pin); the apply adds one eval-doc-grain
  // hit agg and one broadcast-ready left join onto the corpus scan.
  // Docs too short to shingle (<3 tokens) never contaminate by
  // construction and keep their split — the left join's null side.
  private val ContamFrac = 0.5
  val s16 = Q(
    "s16_decontaminate_apply",
    s"""${TextDedup.gidsCte},
      |h AS (SELECT doc_id, gid FROM g WHERE gid NOT IN
      |        (SELECT gid FROM g GROUP BY gid
      |         HAVING COUNT(*) > ${TextDedup.capSql("g")})),
      |a AS (SELECT doc_id, gid,
      |    CASE WHEN ${Fns.hash60Sql("doc_id")} % 100 < 80
      |         THEN 'train' ELSE 'eval' END AS split FROM h),
      |n AS (SELECT doc_id, COUNT(*) AS n_grams FROM a
      |      WHERE split = 'eval' GROUP BY doc_id),
      |p AS (SELECT ev.doc_id AS eval_doc_id, tr.doc_id AS train_doc_id,
      |        CAST(COUNT(*) AS BIGINT) AS shared_grams
      |      FROM a ev JOIN a tr ON ev.gid = tr.gid
      |      WHERE ev.split = 'eval' AND tr.split = 'train'
      |      GROUP BY 1, 2),
      |hits AS (SELECT eval_doc_id,
      |        CAST(COUNT(*) AS BIGINT) AS n_hits
      |      FROM p JOIN n ON p.eval_doc_id = n.doc_id
      |      WHERE p.shared_grams >= 3
      |        AND CAST(p.shared_grams AS DOUBLE) / n.n_grams
      |          >= $ContamFrac
      |      GROUP BY eval_doc_id),
      |alld AS (SELECT doc_id,
      |    CASE WHEN ${Fns.hash60Sql("doc_id")} % 100 < 80
      |         THEN 'train' ELSE 'eval' END AS split FROM documents)
      |SELECT d.doc_id, d.split,
      |  COALESCE(hits.n_hits, 0) AS n_hits,
      |  hits.eval_doc_id IS NOT NULL AS contaminated,
      |  CASE WHEN hits.eval_doc_id IS NOT NULL THEN 'quarantine'
      |       ELSE 'keep' END AS action
      |FROM alld d LEFT JOIN hits ON d.doc_id = hits.eval_doc_id""".stripMargin) {
    (s, dir) =>
      val hits = s06.run(s, dir)
        .filter(col("shared_grams") >= 3 &&
          col("overlap_frac") >= ContamFrac)
        .groupBy("eval_doc_id").agg(count(lit(1)).as("n_hits"))
      val alld = graft.operators.Sampling.assignSplits(
        Tables.load(s, dir, "documents").select("doc_id"),
        col("doc_id"), Seq("train" -> 80, "eval" -> 100))
      // broadcast is a deliberate HINT, not a bounded-by-construction
      // fact: the hit set is contaminated-eval-doc grain — small on
      // any sane corpus (it is the leak being hunted), but
      // data-dependent. The hint saves the corpus side's exchange
      // (measured: removing it adds a full-corpus shuffle); if a
      // pathological corpus ever overflows the broadcast limit the
      // job fails loudly and the hint is the one line to drop.
      alld.join(broadcast(hits),
          col("doc_id") === col("eval_doc_id"), "left")
        .select(col("doc_id"), col("split"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          col("eval_doc_id").isNotNull.as("contaminated"),
          when(col("eval_doc_id").isNotNull, "quarantine")
            .otherwise("keep").as("action"))
  }

  // ---------------------------------------------------------------
  // s17 dataset datasheet — the per-source release card every shipped
  // corpus carries (Datasheets for Datasets, Gebru et al. 2021, the
  // quantitative half): volume (docs/tokens), language profile
  // (distinct langs, English fraction), hygiene (exact-duplicate
  // fraction from d01's election, Gopher quality-pass fraction from
  // t09's verdict), and density (mean doc tokens). Single-sourced
  // like s11: the duplicate and quality definitions are d01/t09's
  // OWN — Spark joins their run() outputs, the oracle nests their
  // SQL — so the datasheet can never disagree with the operators it
  // summarizes.
  //
  // Scale shape: d01's window and t09's narrow scan do the heavy
  // lifting; the datasheet adds one (doc-grain) 3-way join on doc_id
  // and a |sources|-bounded aggregate.
  val s17 = Q(
    "s17_datasheet",
    s"""WITH dup AS (${TextDedup.d01.oracle.get}),
      |qf AS (${TextAnalysis.t09.oracle.get}),
      |base AS (SELECT doc_id, source, lang,
      |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_toks
      |  FROM documents)
      |SELECT base.source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(DISTINCT base.lang) AS BIGINT) AS n_langs,
      |  CAST(SUM(CASE WHEN base.lang = 'en' THEN 1 ELSE 0 END)
      |    AS BIGINT)::DOUBLE / COUNT(*) AS en_frac,
      |  CAST(SUM(CASE WHEN dup.is_dup THEN 1 ELSE 0 END)
      |    AS BIGINT)::DOUBLE / COUNT(*) AS dup_frac,
      |  CAST(SUM(CASE WHEN qf.keep THEN 1 ELSE 0 END)
      |    AS BIGINT)::DOUBLE / COUNT(*) AS quality_keep_frac,
      |  CAST(SUM(n_toks) AS BIGINT)::DOUBLE / COUNT(*)
      |    AS mean_doc_tokens
      |FROM base JOIN dup ON base.doc_id = dup.doc_id
      |  JOIN qf ON base.doc_id = qf.doc_id
      |GROUP BY base.source""".stripMargin) { (s, dir) =>
    val dup = TextDedup.d01.run(s, dir).select(col("doc_id"),
      col("is_dup"))
    val qf = TextAnalysis.t09.run(s, dir).select(col("doc_id"),
      col("keep"))
    val base = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        size(Fns.tokens(col("text"))).cast(LongType).as("n_toks"))
    base.join(dup, "doc_id").join(qf, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        countDistinct("lang").as("n_langs"),
        (sum(when(col("lang") === "en", 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1))).as("en_frac"),
        (sum(when(col("is_dup"), 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1))).as("dup_frac"),
        (sum(when(col("keep"), 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1))).as("quality_keep_frac"),
        (sum("n_toks").cast(DoubleType) / count(lit(1)))
          .as("mean_doc_tokens"))
  }

  // ---------------------------------------------------------------
  // s18 Z-order layout planner — the 100 TB FILE-LAYOUT operator
  // (Delta/Iceberg `OPTIMIZE ZORDER BY`; Morton 1966): interleave the
  // bits of two normalized dimensions into one clustering key so that
  // sorting by it co-locates rows that are close in EITHER dimension,
  // then cut the sorted order into equal files. The output is the
  // per-file min/max zone map for both dimensions under the z-order
  // layout AND under the naive time-linear layout — exactly the
  // statistics a scan planner prunes files with, so the span-fraction
  // columns ARE the measured skipping factor: a point predicate on a
  // dimension reads, in expectation, Σ_files span_frac/files of the
  // data. Linear layout gives ~1/files spans on time and ~full spans
  // on user_id; z-order gives ~√ narrow spans on BOTH — the reason
  // every lakehouse engine ships it.
  //
  // 100 TB shape: the normalization bounds are one 1-row broadcast
  // agg; the z-key is a narrow integer projection; the inherently
  // global thing is the total order the files cut along — computed
  // TWO-LEVEL (s15's construction) so no task ever sorts the corpus:
  // each layout's sort key gets a 256-value monotone shard prefix
  // (zkey's high byte; the ms range bucket), rank = per-shard
  // row_number + a broadcast 256-row prefix-sum of shard counts, and
  // the file id is NTILE's arithmetic applied to that rank — output
  // identical to the single-window NTILE the oracle runs, with no
  // single-partition stage (measured 21 s → 6 s at 10M events).
  // Linear ordering uses the ms grain (the engine-wide ts contract —
  // ns would tie-break differently in DuckDB's µs-truncated reads).
  private val ZFiles = 32
  private val zkeySql = (0 until 8).map(i =>
    s"(((nu >> $i) & 1) << ${2 * i + 1}) + (((nh >> $i) & 1) << ${2 * i})")
    .mkString(" + ")
  val s18 = Q(
    "s18_zorder_layout",
    s"""WITH b AS (SELECT event_id, user_id,
      |    epoch_ms(ts) // 3600000 AS hr, epoch_ms(ts) AS ms
      |  FROM events),
      |g AS (SELECT MIN(user_id) AS u0, MAX(user_id) AS u1,
      |        MIN(hr) AS h0, MAX(hr) AS h1 FROM b),
      |n AS (SELECT b.*, g.u0, g.u1, g.h0, g.h1,
      |    LEAST(255, (user_id - g.u0) * 256 // (g.u1 - g.u0 + 1)) AS nu,
      |    LEAST(255, (hr - g.h0) * 256 // (g.h1 - g.h0 + 1)) AS nh
      |  FROM b, g),
      |z AS (SELECT *, CAST($zkeySql AS BIGINT) AS zkey FROM n),
      |f AS (SELECT 'zorder' AS layout,
      |        NTILE($ZFiles) OVER (ORDER BY zkey, event_id) AS file_id,
      |        user_id, hr, u0, u1, h0, h1 FROM z
      |      UNION ALL
      |      SELECT 'linear',
      |        NTILE($ZFiles) OVER (ORDER BY ms, event_id),
      |        user_id, hr, u0, u1, h0, h1 FROM z)
      |SELECT layout, file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(user_id) AS min_user, MAX(user_id) AS max_user,
      |  MIN(hr) AS min_hr, MAX(hr) AS max_hr,
      |  (MAX(user_id) - MIN(user_id) + 1)::DOUBLE / (u1 - u0 + 1)
      |    AS user_span_frac,
      |  (MAX(hr) - MIN(hr) + 1)::DOUBLE / (h1 - h0 + 1)
      |    AS hr_span_frac
      |FROM f GROUP BY layout, file_id, u0, u1, h0, h1""".stripMargin) {
    (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 3600000000000").as("hr"),
        expr("ts div 1000000").as("ms"))
    val g = ev.agg(min("user_id").as("u0"), max("user_id").as("u1"),
      min("hr").as("h0"), max("hr").as("h1"),
      min("ms").as("m0"), max("ms").as("m1"))
    // one pinned scan feeds both layouts: norms, the Morton key, and
    // each layout's 256-value monotone shard prefix — zkey's high
    // byte; the ms range bucket (monotone in ms, so ordering by
    // (shard, key) IS the key's order)
    val z = graft.operators.Pin(ev.crossJoin(broadcast(g))
      .withColumn("nu", least(lit(255L),
        expr("(user_id - u0) * 256 div (u1 - u0 + 1)")))
      .withColumn("nh", least(lit(255L),
        expr("(hr - h0) * 256 div (h1 - h0 + 1)")))
      .withColumn("zkey", Fns.morton8(col("nu"), col("nh")))
      .withColumn("shard_z", expr("zkey div 256"))
      .withColumn("shard_l", least(lit(255L),
        expr("(ms - m0) * 256 div (m1 - m0 + 1)"))))
    // two-level global rank (s15): per-shard row_number + broadcast
    // prefix-sum of shard counts; then NTILE's own arithmetic — the
    // first N mod F files take ⌈N/F⌉ rows, the rest ⌊N/F⌋ — maps
    // rank → file_id identically to the oracle's window NTILE. The
    // div-q ELSE branch is unreachable when q = 0 (rank ≤ r then).
    def cut(layout: String, shard: String,
        order: Seq[org.apache.spark.sql.Column]) = {
      val counts = z.groupBy(shard).agg(count(lit(1)).as("c"))
      val off = counts
        .withColumn("offset",
          sum("c").over(Window.orderBy(shard)) - col("c"))
        .select(col(shard), col("offset"))
      val tot = counts.agg(sum("c").as("n"))
        .select(col("n"), expr(s"n div $ZFiles").as("q"),
          (col("n") % ZFiles).as("r"))
      z.withColumn("pos", row_number().over(
          Window.partitionBy(shard).orderBy(order: _*)))
        .join(broadcast(off), shard)
        .crossJoin(broadcast(tot))
        .withColumn("rank", col("offset") + col("pos"))
        .select(lit(layout).as("layout"),
          expr(s"""CASE WHEN rank <= r * (q + 1)
            THEN (rank - 1) div (q + 1) + 1
            ELSE r + 1 + (rank - 1 - r * (q + 1)) div q END""")
            .cast("int").as("file_id"),
          col("user_id"), col("hr"),
          col("u0"), col("u1"), col("h0"), col("h1"))
    }
    cut("zorder", "shard_z", Seq(col("zkey"), col("event_id")))
      .unionAll(cut("linear", "shard_l", Seq(col("ms"), col("event_id"))))
      .groupBy("layout", "file_id", "u0", "u1", "h0", "h1")
      .agg(count(lit(1)).as("n_rows"),
        min("user_id").as("min_user"), max("user_id").as("max_user"),
        min("hr").as("min_hr"), max("hr").as("max_hr"))
      .select(col("layout"), col("file_id"), col("n_rows"),
        col("min_user"), col("max_user"), col("min_hr"), col("max_hr"),
        ((col("max_user") - col("min_user") + 1).cast(DoubleType) /
          (col("u1") - col("u0") + 1)).as("user_span_frac"),
        ((col("max_hr") - col("min_hr") + 1).cast(DoubleType) /
          (col("h1") - col("h0") + 1)).as("hr_span_frac"))
  }

  // ---------------------------------------------------------------
  // s19 Bloom-filter decontamination — the PRODUCTION-scale path of
  // the s06/s16 overlap check (Brown et al. 2020 appendix C run their
  // GPT-3 decontamination exactly this way: a Bloom filter over the
  // benchmark n-grams, scanned against the training corpus): build a
  // Bloom sketch over the EVAL side's distinct gram hashes, broadcast
  // it, and probe every train doc's grams in a single narrow pass —
  // per train doc, its gram count, the sketched hit count, and the
  // ≥3-shared-grams flag. The flag is the CORPUS-level screen of
  // s06's per-pair ≥3 test: a doc sharing <3 grams with the whole
  // eval SET cannot share ≥3 with any single eval doc, so every doc
  // s06/s16 would quarantine passes this screen — the cheap first
  // stage that lets the exact join run on the flagged slice only.
  //
  // Why this exists next to s06: s06's inverted-index equi-join is
  // exact but pays an index-grain shuffle on gid; the Bloom pass
  // moves ZERO corpus rows — the only corpus-grain work is the
  // per-doc agg, and the only eval-side cost is the sketch build
  // (two bounded passes: distinct-count then build). In production
  // the eval side is a fixed benchmark suite — KB–MB of sketch for
  // any corpus size — so the bits stay broadcastable at 100 TB by
  // construction; here eval is the 20 % split so the contract is
  // exercised at every SF. One-sided error is the trade: no false
  // negatives ever (a leak cannot hide), ~fpp false positives
  // (quarantine a hair too much — the safe direction for eval
  // hygiene).
  //
  // Bloom bit layouts are engine-specific, so the registered row is
  // a BOUNDED-ERROR oracle row (VERDICT r10 ask #6, e14's contract):
  // the query carries both arms — per train doc the exact gram count
  // and exact eval-set hit count (DuckDB-verified against the same
  // capped-gram CTE s06 uses), plus two flags the oracle pins TRUE:
  // `screen_sound` (the one-sided-error law per doc: the Bloom probe
  // NEVER undercounts the exact hits, so no leak can pass the
  // screen) and `fp_bounded` (suite-level overcount within 3×fpp of
  // the clean-probe volume + slack, attached per row via a broadcast
  // 1-row aggregate — the SketchAnchorSpec bound, now hash-gated).
  // The exact arm's eval-gid semi-join is the AUDIT's price, paid to
  // buy the oracle row; the production screen stays the zero-join
  // broadcast-sketch probe (graft.streaming.DecontamGate.screen —
  // the per-document intake hot path, spec'd for plan parity with
  // this audit's filter).
  private[queries] val BloomFpp = 0.01
  val s19 = Q(
    "s19_bloom_decontaminate",
    s"""${TextDedup.gidsCte},
      |h AS (SELECT doc_id, gid FROM g WHERE gid NOT IN
      |        (SELECT gid FROM g GROUP BY gid HAVING COUNT(*) > ${TextDedup.capSql("g")})),
      |a AS (SELECT doc_id, gid,
      |    CASE WHEN ${Fns.hash60Sql("doc_id")} % 100 < 80
      |         THEN 'train' ELSE 'eval' END AS split FROM h),
      |e AS (SELECT DISTINCT gid FROM a WHERE split = 'eval')
      |SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN e.gid IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS exact_hits,
      |  TRUE AS screen_sound, TRUE AS fp_bounded
      |FROM a LEFT JOIN e ON a.gid = e.gid
      |WHERE a.split = 'train' GROUP BY a.doc_id""".stripMargin) {
      (s, dir) =>
    val a = graft.operators.Sampling.assignSplits(
      TextDedup.cappedGids(s, dir), col("doc_id"),
      Seq("train" -> 80, "eval" -> 100))
    // ONE pinned distinct eval-gid relation serves all three
    // consumers (guide §2.4 "two operations keyed the same way share
    // one exchange"): the filter's sizing count, the sketch build,
    // and the exact arm's membership join below previously each ran
    // their own distinct aggregation over the capped-gid pin — the
    // sizing count now materializes this pin and the other two read
    // cache. assumeDistinct skips buildFilter's internal re-dedup
    // (cache substitution happens after redundant-aggregate
    // elimination, so it would plan as a second full aggregation).
    val evalDistinct = Pin(
      a.filter(col("split") === "eval").select("gid").distinct())
    // the filter build stays the SHARED definition with the
    // streaming intake gate (graft.streaming.DecontamGate — its
    // screen probes the same sketch this audit was run with)
    val bloom = graft.streaming.DecontamGate.buildFilter(
      evalDistinct, BloomFpp, assumeDistinct = true)
    // the probe is Spark's own codegen'd BloomFilterMightContain over
    // the serialized sketch literal (VERDICT r8 ask #8) — the corpus
    // scan stays inside whole-stage codegen, no ScalaUDF hop
    val hit = graft.streaming.DecontamGate.mightContain(bloom, col("gid"))
    // exact arm: both sides descend from the gid-partitioned
    // cappedGids pin, so the eval-distinct + membership join align
    // without a fresh corpus shuffle
    val perDoc = Pin(a.filter(col("split") === "train")
      .join(evalDistinct.withColumn("in_eval", lit(1L)),
        Seq("gid"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("in_eval"), lit(0L))).as("exact_hits"),
        sum(when(hit, 1L).otherwise(0L)).as("bloom_hits")))
    // fp bound at suite grain: expected false positives ≈ fpp ·
    // non-member probes; 3× + slack 10 (SketchAnchorSpec's bound)
    val tot = perDoc.agg(
      sum(col("bloom_hits") - col("exact_hits")).as("fp"),
      sum(col("n_grams") - col("exact_hits")).as("clean"))
    perDoc.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_grams"), col("exact_hits"),
        (col("bloom_hits") >= col("exact_hits")).as("screen_sound"),
        (col("fp") <= lit(3 * BloomFpp) * col("clean") + lit(10.0))
          .as("fp_bounded"))
  }

  val all: Seq[Q] =
    Seq(s01, s02, s03, s04, s05, s06, s07, s08, s09, s10, s11, s12, s13,
      s14, s15, s16, s17, s18, s19, c01)
}
