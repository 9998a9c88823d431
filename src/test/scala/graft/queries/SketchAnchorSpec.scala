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
      val out = SourceQueries.s19.run(spark, dir).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
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
      var probes = 0L
      var trueHits = 0L
      var overcount = 0L
      exact.foreach { case (doc, (nGrams, exactHits)) =>
        val (bloomGrams, bloomHits, flagged) = out(doc)
        assert(bloomGrams === nGrams, s"$dir doc $doc gram count")
        // the one-sided error contract: a Bloom filter NEVER misses
        assert(bloomHits >= exactHits,
          s"$dir doc $doc false negative: bloom=$bloomHits exact=$exactHits")
        if (exactHits >= 3)
          assert(flagged, s"$dir doc $doc leak not flagged")
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
    // grams with the same one-sided filter, so every doc the batch
    // audit flags must be flagged at the gate too
    SourceQueries.s19.run(spark, dir).collect().foreach { r =>
      if (r.getAs[Boolean]("flagged")) {
        val id = r.getAs[Long]("doc_id")
        assert(batch(id)._3,
          s"doc $id flagged by batch s19 but missed by the gate")
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
      // guarantee is stated against), not the vocabulary size
      val n = graft.Tables.load(spark, dir, "documents")
        .select(col("source"),
          size(graft.functions.Fns.tokens(col("text"))).as("k"))
        .groupBy("source").agg(sum("k").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // the never-undercount half is a DETERMINISTIC CMS property —
      // it must hold for every probe on any fixture
      rows.foreach { r =>
        assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("n_exact"),
          s"$dir ${r.getAs[String]("source")} " +
            s"'${r.getAs[String]("token")}' undercount: " +
            s"cms=${r.getAs[Long]("cms_estimate")} " +
            s"exact=${r.getAs[Long]("n_exact")}")
      }
      // the eps*N half is only PER-QUERY probabilistic (1−δ = 0.99):
      // a per-row assertion held before only because seed and corpus
      // are fixed (ADVICE r8). Tolerate ≤1 % of probes over the bound
      // so a new SF/fixture fails only on a real sketch bug, not on
      // the expected δ tail — and name the dependence in the message.
      val over = rows.filter { r =>
        val bound = math.max(2.0, TextAnalysis.CmsEps * n(r.getAs[String]("source")))
        r.getAs[Long]("cms_estimate") - r.getAs[Long]("n_exact") > bound
      }
      val allowed = math.max(1, rows.length / 100)
      assert(over.length <= allowed,
        s"$dir ${over.length}/${rows.length} probes exceed eps*N " +
          s"(allowed $allowed at delta=0.01). If this fires after a " +
          "fixture/SF change it may be the expected per-query delta " +
          "tail (fixed-seed dependence), not a regression — check " +
          s"the offenders: ${over.take(3).map(r =>
            r.getAs[String]("source") + "/" + r.getAs[String]("token"))
            .mkString(", ")}")
    }
  }
}
