package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Behavioral specs for the round-4 training-pipeline queries (the
  * oracle proves cross-engine parity on the real tables; these prove
  * the SEMANTICS on adversarial fixtures the synthetic corpus never
  * hits: per-rule filter failures, cross-split-only overlap, share
  * normalization, quantization edge codes). */
class PipelineQueriesSpec extends SparkTestBase {

  private def docsDir(rows: Seq[(Long, String, String)],
      sources: Seq[String] = Seq.empty): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    val df =
      if (sources.isEmpty) rows.toDF("doc_id", "text", "lang")
      else rows.zip(sources).map { case ((id, t, l), src) => (id, t, l, src) }
        .toDF("doc_id", "text", "lang", "source")
    df.write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("s14: overlapping token windows — stride grid, short-tail " +
      "drop, single-chunk short docs, exact slice text") {
    val toks = (0 until 100).map(i => s"w$i")
    val dir = docsDir(Seq(
      (1L, toks.mkString(" "), "en"),
      (2L, "only five words in here", "en")))
    val out = queries.SourceQueries.s14.run(spark, dir).collect()
    val c1 = out.filter(_.getAs[Long]("doc_id") == 1L)
      .sortBy(_.getAs[Long]("chunk_id"))
    // starts 0, 48, 96 — the 4-token tail at 96 is dropped (<16 and
    // not the only chunk)
    assert(c1.map(_.getAs[Long]("chunk_id")).toSeq === Seq(0L, 1L))
    assert(c1(0).getAs[Long]("tok_start") === 0L)
    assert(c1(0).getAs[Long]("tok_end") === 64L)
    assert(c1(0).getAs[String]("chunk_text") ===
      toks.take(64).mkString(" "))
    assert(c1(1).getAs[Long]("tok_start") === 48L)
    assert(c1(1).getAs[Long]("n_tokens") === 52L)
    assert(c1(1).getAs[String]("chunk_text") ===
      toks.slice(48, 100).mkString(" "))
    val c2 = out.filter(_.getAs[Long]("doc_id") == 2L)
    assert(c2.length === 1) // sole sub-minimum chunk is kept
    assert(c2.head.getAs[Long]("n_tokens") === 5L)
  }

  test("d15: containment catches a doc wholly pasted inside a " +
      "superset that Jaccard misses; sub-threshold overlap excluded") {
    val a = (1 to 10).map(i => s"a$i").mkString(" ")
    val b = ((1 to 10).map(i => s"a$i") ++ (1 to 20).map(i => s"b$i"))
      .mkString(" ")
    val d = ((1 to 6).map(i => s"a$i") ++ (1 to 10).map(i => s"c$i"))
      .mkString(" ")
    val dir = docsDir(Seq((1L, a, "en"), (2L, b, "en"), (3L, d, "en")))
    val out = queries.TextDedup.d15.run(spark, dir).collect()
    assert(out.length === 1) // doc3 shares only 4/8 grams: 0.5 < 0.8
    val r = out.head
    assert(r.getAs[Long]("contained_doc") === 1L)
    assert(r.getAs[Long]("container_doc") === 2L)
    assert(r.getAs[Long]("inter") === 8L)
    assert(r.getAs[Long]("n_contained") === 8L)
    assert(r.getAs[Double]("containment") === 1.0)
    // same corpus under d02's Jaccard bar: invisible (J = 8/28)
    assert(queries.TextDedup.d02.run(spark, dir).collect().isEmpty)
  }

  test("s15: epoch tiers from length+diversity rules; per-epoch " +
      "train_pos is the exact md5-order permutation") {
    val rich = (1 to 50).map(i => s"w$i").mkString(" ") // 3 epochs
    val rep = Seq.fill(25)("x y").mkString(" ")  // 50 words, 2 distinct
    val mid = (1 to 25).map(i => s"m$i").mkString(" ") // 2 epochs
    val tiny = "just four words here" // 1 epoch
    val dir = docsDir(Seq(
      (1L, rich, "en"), (2L, rep, "en"), (3L, mid, "en"), (4L, tiny, "en")))
    val out = queries.SourceQueries.s15.run(spark, dir).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("epoch")).sorted.toSeq).toMap
    assert(byDoc(1L) === Seq(1L, 2L, 3L)) // long + diverse
    assert(byDoc(2L) === Seq(1L, 2L)) // long but 2-word vocab: mid
    assert(byDoc(3L) === Seq(1L, 2L))
    assert(byDoc(4L) === Seq(1L))
    // train_pos within each epoch = rank in (shuffle_key, doc_id)
    // order — the two-level shard computation must equal the plain
    // global sort
    out.groupBy(_.getAs[Long]("epoch")).foreach { case (_, rows) =>
      val expect = rows.sortBy(r =>
        (r.getAs[String]("shuffle_key"), r.getAs[Long]("doc_id")))
        .map(_.getAs[Long]("doc_id")).toSeq
      val got = rows.sortBy(_.getAs[Long]("train_pos"))
        .map(_.getAs[Long]("doc_id")).toSeq
      assert(got === expect)
      assert(rows.map(_.getAs[Long]("train_pos")).sorted.toSeq ===
        (1L to rows.length).toSeq) // dense permutation
    }
  }

  test("d16: ensemble consensus — identical docs flagged by all four " +
      "detectors; a strict superset by containment but not Jaccard") {
    val a = (1 to 10).map(i => s"a$i").mkString(" ")
    val b = ((1 to 10).map(i => s"a$i") ++ (1 to 20).map(i => s"b$i"))
      .mkString(" ")
    val c = (1 to 30).map(i => s"c$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, a, "en"), (2L, b, "en"), (5L, c, "en"), (6L, c, "en")))
    val out = queries.TextDedup.d16.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r)
      .toMap
    val ident = out((5L, 6L)) // byte-identical pair: every detector
    assert(ident.getAs[Long]("n_detectors") === 4L)
    assert(ident.getAs[Boolean]("by_jaccard") &&
      ident.getAs[Boolean]("by_containment") &&
      ident.getAs[Boolean]("by_minhash") &&
      ident.getAs[Boolean]("by_simhash"))
    // doc1 wholly inside doc2: the containment detector's
    // characteristic catch, invisible to the Jaccard bar (J = 8/28)
    val sup = out((1L, 2L))
    assert(sup.getAs[Boolean]("by_containment"))
    assert(!sup.getAs[Boolean]("by_jaccard"))
  }

  test("s16: decontamination apply — identical-text eval docs " +
      "quarantine, distinct-text corpus keeps everything, short docs " +
      "keep their split") {
    // corpus 1: 40 byte-identical docs — every eval doc fully
    // overlaps every train doc
    val text = (1 to 20).map(i => s"w$i").mkString(" ")
    val dir = docsDir((1L to 40L).map(id => (id, text, "en")) :+
      (41L, "too short", "en"))
    val out = queries.SourceQueries.s16.run(spark, dir).collect()
    val bySplit = out.filter(_.getAs[Long]("doc_id") <= 40L)
      .groupBy(_.getAs[String]("split"))
    assert(bySplit.keySet === Set("train", "eval")) // both occupied
    bySplit("eval").foreach { r =>
      assert(r.getAs[Boolean]("contaminated"))
      assert(r.getAs[String]("action") === "quarantine")
      assert(r.getAs[Long]("n_hits") === bySplit("train").length.toLong)
    }
    bySplit("train").foreach { r =>
      assert(!r.getAs[Boolean]("contaminated"))
      assert(r.getAs[String]("action") === "keep")
    }
    // the 2-token doc cannot shingle: keeps its split, zero hits
    val short = out.find(_.getAs[Long]("doc_id") == 41L).get
    assert(!short.getAs[Boolean]("contaminated"))
    assert(short.getAs[Long]("n_hits") === 0L)
    // corpus 2: all-distinct vocabularies — nobody contaminates
    val dir2 = docsDir((1L to 10L).map(id =>
      (id, (1 to 20).map(i => s"d${id}w$i").mkString(" "), "en")))
    val out2 = queries.SourceQueries.s16.run(spark, dir2).collect()
    assert(out2.length === 10)
    assert(out2.forall(_.getAs[String]("action") === "keep"))
  }

  test("t15: BPE merge candidates — within-token duplicate pairs " +
      "count per occurrence, frequency-weighted, tiebreak by pair") {
    val dir = docsDir(Seq(
      (1L, "aaa bb", "en"), // aaa -> aa twice; bb -> bb once
      (2L, "ab ab x", "en"))) // ab token frequency 2; 1-char x drops
    val out = queries.TextAnalysis.t15.run(spark, dir).collect()
      .sortBy(_.getAs[Long]("rnk"))
    val got = out.map(r => (r.getAs[String]("pair"),
      r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_token_types"),
      r.getAs[Long]("rnk")))
    assert(got.toSeq === Seq(
      ("aa", 2L, 1L, 1L), // 2 occurrences inside ONE token type
      ("ab", 2L, 1L, 2L), // token frequency 2, tiebreak aa < ab
      ("bb", 1L, 1L, 3L)))
  }

  test("d17: delta dedup — existing match wins, first-in-batch is " +
      "the fallback canonical, only the batch is reported") {
    val dir = docsDir(Seq(
      (3L, "shared with incoming nine", "en"), // existing
      (4L, "unrelated corpus content", "en"), // existing
      (9L, "shared with incoming nine", "en"), // inc: dup_existing
      (19L, "batch internal duplicate", "en"), // inc: first → unique
      (29L, "batch internal duplicate", "en"), // inc: dup_batch of 19
      (39L, "genuinely new content here", "en"))) // inc: unique
    val out = queries.TextDedup.d17.run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"),
          Option(r.get(r.fieldIndex("dup_of_existing"))),
          r.getAs[Long]("canonical_id")))).toMap
    assert(out.keySet === Set(9L, 19L, 29L, 39L)) // batch only
    assert(out(9L) === (("dup_existing", Some(3L), 3L)))
    assert(out(19L) === (("unique", None, 19L)))
    assert(out(29L) === (("dup_batch", None, 19L)))
    assert(out(39L) === (("unique", None, 39L)))
  }

  test("s17: datasheet — per-source volume, language, dup and " +
      "quality fractions from the member operators' own verdicts") {
    val good = (Seq("the", "and") ++ (1 to 58).map(i => s"word$i"))
      .mkString(" ")
    val dir = docsDir(Seq(
      (1L, good, "en"), // canonical, passes quality
      (2L, good, "en"), // exact dup of 1, still passes quality
      (3L, "tiny doc here", "en"), // fails word-count rule
      (4L, "kurz und klein", "de")), // other source, fails quality
      sources = Seq("web", "web", "web", "books"))
    val out = queries.SourceQueries.s17.run(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val web = out("web")
    assert(web.getAs[Long]("n_docs") === 3L)
    assert(web.getAs[Long]("n_langs") === 1L)
    assert(web.getAs[Double]("en_frac") === 1.0)
    assert(web.getAs[Double]("dup_frac") === 1.0 / 3) // doc 2 only
    assert(web.getAs[Double]("quality_keep_frac") === 2.0 / 3)
    val books = out("books")
    assert(books.getAs[Long]("n_docs") === 1L)
    assert(books.getAs[Double]("en_frac") === 0.0)
    assert(books.getAs[Double]("dup_frac") === 0.0)
    assert(books.getAs[Double]("quality_keep_frac") === 0.0)
    assert(books.getAs[Double]("mean_doc_tokens") === 3.0)
  }

  test("t09: each Gopher rule fails independently and gates keep " +
      "(Rae et al. 2021 A1.1)") {
    val good = (Seq("the", "and") ++ Seq.fill(58)("word")).mkString(" ")
    val short = (Seq("the", "and") ++ Seq.fill(8)("word")).mkString(" ")
    val symbols =
      (Seq("the", "and") ++ Seq.fill(58)("!!!!word")).mkString(" ")
    val numeric = (Seq("the", "and") ++ Seq.fill(58)("12345")).mkString(" ")
    val tiny = (Seq("a", "a") ++ Seq.fill(58)("b")).mkString(" ")
    val dir = docsDir(Seq(
      (1L, good, "en"), (2L, short, "en"), (3L, symbols, "en"),
      (4L, numeric, "en"), (5L, tiny, "en")))
    val out = queries.TextAnalysis.t09.run(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("word_count_ok") &&
      !out(2L).getAs[Boolean]("keep"))
    assert(!out(3L).getAs[Boolean]("symbol_ok") &&
      !out(3L).getAs[Boolean]("keep"))
    assert(!out(4L).getAs[Boolean]("alpha_ok") &&
      !out(4L).getAs[Boolean]("keep"))
    assert(!out(5L).getAs[Boolean]("word_len_ok") &&
      !out(5L).getAs[Boolean]("keep"))
    // the stopword gate: 60 alpha words, zero en stopwords
    val noStops = Seq.fill(60)("wort").mkString(" ")
    val dir2 = docsDir(Seq((9L, noStops, "de")))
    val r9 = queries.TextAnalysis.t09.run(spark, dir2).collect().head
    assert(!r9.getAs[Boolean]("stopword_ok") && !r9.getAs[Boolean]("keep"))
  }

  test("s06: overlap pairs cross splits only, never within a split; " +
      "overlap_frac is shared/eval grams") {
    import spark.implicits._
    // find ids on each side of the 80% hash boundary (s02's split)
    val buckets = spark.range(1, 200)
      .select(col("id"),
        (functions.Fns.hash60(col("id").cast("string")) % 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainIds = buckets.filter(_._2 < 80).keys.toSeq.sorted
    val evalIds = buckets.filter(_._2 >= 80).keys.toSeq.sorted
    assert(trainIds.size >= 2 && evalIds.size >= 2)
    val shared = "alpha beta gamma delta epsilon zeta" // 4 shared 3-grams
    val dir = docsDir(Seq(
      (trainIds(0), shared + " trainone tail words", "en"),
      (trainIds(1), "totally different text body here", "en"),
      (evalIds(0), shared + " evalone other ending", "en"),
      (evalIds(1), shared + " evaltwo other ending", "en")))
    val out = queries.SourceQueries.s06.run(spark, dir).collect()
    // eval0/eval1 share 6 grams with EACH OTHER but are both eval —
    // only (eval, train) pairs may appear
    assert(out.nonEmpty)
    assert(out.forall(r =>
      evalIds.contains(r.getAs[Long]("eval_doc_id")) &&
        trainIds.contains(r.getAs[Long]("train_doc_id"))))
    out.foreach { r =>
      assert(r.getAs[Long]("shared_grams") === 4L)
      assert(r.getAs[Double]("overlap_frac") ===
        4.0 / r.getAs[Long]("eval_grams"))
    }
  }

  test("s07: resampled shares sum to 1 and flatten the distribution " +
      "(tail upsampled, head downsampled)") {
    val mk = (n: Int, lang: String) =>
      (1 to n).map(i => (i.toLong, "w1 w2 w3 w4", lang))
    val dir = docsDir(mk(90, "en") ++ mk(10, "yo"))
    val out = queries.SourceQueries.s07.run(spark, dir)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    val sumShares =
      out.values.map(_.getAs[Double]("resampled_share")).sum
    assert(math.abs(sumShares - 1.0) < 1e-9)
    assert(out("yo").getAs[Double]("upsample_factor") > 1.0)
    assert(out("en").getAs[Double]("upsample_factor") < 1.0)
    assert(out("yo").getAs[Double]("resampled_share") >
      out("yo").getAs[Double]("natural_share"))
  }

  test("plan shapes: t09 and v05 are shuffle-free narrow compute with " +
      "pruned scans; s07 output is driver-scale (two small exchanges)") {
    val dir = "/root/testdata/sf0.001"
    val t09p = queries.TextAnalysis.t09.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!t09p.contains("Exchange"),
      "t09 is a per-row filter verdict — any exchange is a bug")
    assert(t09p.contains(
      "ReadSchema: struct<doc_id:bigint,text:string,lang:string>"),
      "t09 should prune the documents scan to doc_id+text+lang")
    val v05p = queries.VectorSearch.v05.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!v05p.contains("Exchange"),
      "v05 quantizes per row — any exchange is a bug")
    val s07p = queries.SourceQueries.s07.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(s07p.linesIterator.count(_.trim.startsWith("Exchange")) <= 2,
      "s07 is one lang groupBy + one driver-scale window")
  }

  test("graft_gram2_stats / graft_quant8_stats register on the SQL " +
      "surface and match the Column wrappers") {
    import spark.implicits._
    plans.GraftExtensions.register(spark)
    Seq(("a b a b")).toDF("text").createOrReplaceTempView("pq_t")
    val g = spark.sql(
      "SELECT graft_gram2_stats(split(text,' ')) AS f FROM pq_t")
      .select("f.n_grams", "f.n_distinct", "f.top", "f.dup")
      .head()
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3)) ===
      ((3L, 2L, 2L, 2L))) // grams: "a b"×2, "b a"×1 → top=2, dup=2
    Seq(Seq(1000000L, -500000L)).toDF("sx").createOrReplaceTempView("pq_v")
    val q = spark.sql(
      "SELECT graft_quant8_stats(sx) AS f FROM pq_v")
      .select("f.scale", "f.n_sat").head()
    assert(q.getLong(0) === 1000000L && q.getLong(1) === 1L)
  }

  test("e18: transition counts and lift from a hand-built stream " +
      "(lift > 1 for the forced pattern, < 1 for the avoided one)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    // user 1: a→b a→b a→b ; user 2: b→a — "a then b" is forced,
    // "a then a" never happens
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (1L, 5L, "a"), (1L, 6L, "b"), (2L, 7L, "b"), (2L, 8L, "a"))
    rows.toDF("user_id", "event_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val out = queries.EventAnalytics.e18.run(spark, dir).collect()
      .map(r => (r.getAs[String]("prev_type"),
        r.getAs[String]("next_type")) -> r).toMap
    // u1 (a b a b a b) → a→b ×3, b→a ×2; u2 (b a) → b→a ×1 — six
    // transitions, no self-loops
    assert(out(("a", "b")).getAs[Long]("n_ab") === 3L)
    assert(out(("b", "a")).getAs[Long]("n_ab") === 3L)
    assert(!out.contains(("a", "a")) && !out.contains(("b", "b")))
    val ab = out(("a", "b"))
    // n=6, n_from(a)=3, n_to(b)=3 → lift = 3·6/(3·3) = 2.0
    assert(ab.getAs[Long]("n_from") === 3L)
    assert(ab.getAs[Long]("n_to") === 3L)
    assert(ab.getAs[Double]("lift") === 2.0)
    assert(ab.getAs[Double]("p_ab") === 0.5)
  }

  test("d08: counts docs of source a duplicated in source b; " +
      "same-source duplication never appears") {
    val sharedText = "alpha beta gamma delta epsilon"
    val dir = docsDir(Seq(
      (1L, sharedText, "en"), (2L, sharedText, "en"),
      (3L, sharedText, "en"), (4L, "totally different words here now", "en"),
      (5L, "another unrelated body of text", "en")),
      sources = Seq("srcA", "srcA", "srcB", "srcA", "srcB"))
    val out = queries.TextDedup.d08.run(spark, dir).collect()
      .map(r => (r.getAs[String]("source_a"),
        r.getAs[String]("source_b")) -> r).toMap
    // docs 1,2 (srcA) and 3 (srcB) share the fingerprint; 4/5 don't
    assert(out(("srcA", "srcB")).getAs[Long]("n_dup_docs") === 2L)
    assert(out(("srcB", "srcA")).getAs[Long]("n_dup_docs") === 1L)
    assert(out(("srcA", "srcB")).getAs[Long]("n_docs_a") === 3L)
    assert(out(("srcA", "srcB")).getAs[Double]("dup_share") === 2.0 / 3.0)
    assert(out.keys.forall { case (a, b) => a != b })
  }

  test("d09: identical docs are truth pairs the bands must recall; " +
      "report counts are consistent") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = docsDir(Seq(
      (1L, dup, "en"), (2L, dup, "en"),
      (3L, "completely different words in this one body", "en"),
      (4L, "and a fourth unrelated document text here", "en")))
    val r = queries.TextDedup.d09.run(spark, dir).collect().head
    // docs 1/2 share every gram → Jaccard 1.0 truth pair AND all 8
    // minhashes equal → every band agrees: the pair must be recalled
    assert(r.getAs[Long]("n_true_pairs") === 1L)
    assert(r.getAs[Long]("n_hits") === 1L)
    assert(r.getAs[Double]("lsh_recall") === 1.0)
    val cand = r.getAs[Long]("n_candidate_pairs")
    assert(cand >= 1L)
    assert(r.getAs[Double]("lsh_precision") === 1.0 / cand)
  }

  test("s08: rows are taken in (hash, id) order until the stratum " +
      "budget; the crossing row and its tail drop") {
    import spark.implicits._
    val df = Seq(
      (1L, "s1", 40L), (2L, "s1", 40L), (3L, "s1", 40L),
      (4L, "s2", 90L), (5L, "s2", 90L))
      .toDF("doc_id", "source", "n_tokens")
    val out = operators.Sampling.takeWeightBudget(
        df, col("doc_id"), col("source"), col("n_tokens"), budget = 100L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("cum_weight")).toMap
    // s1: two 40s fit (cum 40, 80), the third (cum 120) crosses and
    // drops; s2: one 90 fits, the second (180) drops
    assert(out.size === 3)
    assert(out.values.forall(_ <= 100L))
    val s1Kept = out.keys.filter(id => id <= 3L)
    assert(s1Kept.size === 2)
    assert(out.keys.count(_ >= 4L) === 1)
    intercept[IllegalArgumentException] {
      operators.Sampling.takeWeightBudget(
        df, col("doc_id"), col("source"), col("n_tokens"), budget = 0L)
    }
  }

  test("s09: only cross-split near-dup pairs appear, oriented " +
      "(eval_vec, train_vec); same-split duplicates are excluded") {
    import spark.implicits._
    val buckets = spark.range(1, 200)
      .select(col("id"),
        (functions.Fns.hash60(col("id").cast("string")) % 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainIds = buckets.filter(_._2 < 80).keys.toSeq.sorted
    val evalIds = buckets.filter(_._2 >= 80).keys.toSeq.sorted
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    val v = Array(1.0f, 0.9f, 0.8f, 0.7f, 0.6f, 0.5f, 0.4f, 0.3f)
    val far = Array(-1.0f, 0.9f, -0.8f, 0.7f, -0.6f, 0.5f, -0.4f, 0.3f)
    Seq(
      (trainIds(0), v, 0), // near-dup with the eval vector (cos = 1)
      (evalIds(0), v, 0), // ...cross-split → must be reported
      (trainIds(1), v, 0), // same vector, but train/train → excluded
      (trainIds(2), far, 0)) // dissimilar → not a near-dup at all
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = queries.SourceQueries.s09.run(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("eval_vec_id") === evalIds(0))
      assert(trainIds.contains(r.getAs[Long]("train_vec_id")))
      assert(r.getAs[Double]("cosine") >= 0.3)
    }
    // both cross-split train twins pair with the eval vector; the
    // train/train duplicate pair must NOT surface
    assert(out.map(_.getAs[Long]("train_vec_id")).toSet ===
      Set(trainIds(0), trainIds(1)))
  }

  test("round-4 queries tolerate empty inputs (no ANSI aborts, " +
      "sane degenerate outputs)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    Seq.empty[(Long, Long, String, java.sql.Timestamp, Option[Double],
        String)]
      .toDF("user_id", "event_id", "event_type", "ts", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // per-row / filtered queries: empty in, empty out
    Seq(queries.TextAnalysis.t09, queries.TextAnalysis.t10,
      queries.SourceQueries.s06,
      queries.SourceQueries.s07, queries.SourceQueries.s08,
      queries.SourceQueries.s09, queries.TextDedup.d08,
      queries.VectorSearch.v05, queries.VectorSearch.v06,
      queries.VectorSearch.v07, queries.VectorSearch.v08,
      queries.VectorSearch.v09, queries.VectorSearch.v10,
      queries.TextDedup.d11, queries.TextDedup.d12,
      queries.TextDedup.d13,
      queries.TextAnalysis.t12, queries.TextAnalysis.t13,
      queries.TextAnalysis.t14,
      queries.VectorSearch.v11, queries.VectorSearch.v12,
      queries.VectorSearch.v13, queries.VectorSearch.d14,
      queries.SourceQueries.s10, queries.SourceQueries.s11,
      queries.SourceQueries.s12, queries.SourceQueries.s13,
      queries.VectorSearch.v14, queries.GraphQueries.g03,
      queries.EventAnalytics.e18, queries.EventAnalytics.e19,
      queries.TextDedup.d15, queries.SourceQueries.s14,
      queries.TextDedup.d16, queries.SourceQueries.s15,
      queries.SourceQueries.s16, queries.VectorSearch.v15,
      queries.TextDedup.d17, queries.SourceQueries.s17,
      queries.TextAnalysis.t15, queries.VectorSearch.v16,
      queries.VectorSearch.v19, queries.SourceQueries.s19,
      queries.TextAnalysis.t16, queries.VectorSearch.v20)
      .foreach { q =>
        assert(q.run(spark, dir).count() === 0L, s"${q.name} not empty")
      }
    // d09 is a one-row report — zero counts, NULL ratios (the
    // division guards), never a divide-by-zero abort
    val r = queries.TextDedup.d09.run(spark, dir).collect().head
    assert(r.getAs[Long]("n_true_pairs") === 0L)
    assert(r.getAs[Long]("n_hits") === 0L)
    assert(r.isNullAt(r.fieldIndex("lsh_recall")))
    assert(r.isNullAt(r.fieldIndex("lsh_precision")))
    // q27 is a |constraints|-row report — on an empty table every
    // metric is a 0/0 NULL (never an abort) and so is its verdict
    val checks = queries.Relational.q27.run(spark, dir).collect()
    assert(checks.length === 6)
    checks.foreach { c =>
      assert(c.isNullAt(c.fieldIndex("metric")),
        s"${c.getAs[String]("check_name")} metric not null on empty")
      assert(c.isNullAt(c.fieldIndex("passed")))
    }
  }

  test("v06: clustered corpus where true neighbors share the query's " +
      "cell → probe search recalls everything") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    // 3 tight clusters on axes e0/e1/e2; query vec_id=0 sits in
    // cluster 0, so its true top-5 are label-0 vectors and nprobe=2
    // must include cell 0 → recall@5 = 1.0
    val vecs = (0 until 60).map { i =>
      val label = i % 3
      val base = Array.fill(4)(0.0f)
      base(label) = 1.0f
      base(3) = (i * 0.001f) // tiny distinct perturbation
      (i.toLong, base, label)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = queries.VectorSearch.v06.run(spark, dir).collect()
    // bounded query set: only vec_id 0 (and 50) satisfy %50==0
    assert(out.length === 2)
    val r0 = out.find(_.getAs[Long]("q_id") === 0L).get
    assert(r0.getAs[Long]("n_hits") === 5L)
    assert(r0.getAs[Double]("recall_at_5") === 1.0)
  }

  test("v07: mislabeled vector switches to the nearest cell; clean " +
      "clusters keep their members and an untouched cell's shift is " +
      "exactly 0") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    // 10 vectors per label on axis 0/1/2 (tiny distinct perturbation
    // in dim 3), plus one MISLABELED vector: label 0 but sitting on
    // axis 1 — Lloyd's must move it to cell 1
    val clean = (0 until 30).map { i =>
      val label = i % 3
      val base = Array.fill(4)(0.0f)
      base(label) = 1.0f
      base(3) = i * 0.001f
      (i.toLong, base, label)
    }
    val outlier = (99L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0)
    (clean :+ outlier).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = queries.VectorSearch.v07.run(spark, dir).collect()
      .map(r => r.getAs[Int]("cell") ->
        ((r.getAs[Long]("n_members"), r.getAs[Long]("n_switched"),
          r.getAs[Double]("shift")))).toMap
    assert(out.keySet === Set(0, 1, 2))
    assert(out.values.map(_._1).sum === 31L) // every vector assigned once
    assert(out(1)._1 === 11L && out(1)._2 === 1L) // gained the outlier
    assert(out(0)._1 === 10L && out(0)._2 === 0L) // lost it
    // cells that gained/lost members moved; cell 2's membership is
    // unchanged, so its re-averaged centroid is bit-identical -> 0.0
    assert(out(0)._3 > 0.0 && out(1)._3 > 0.0)
    assert(out(2)._3 === 0.0)
  }

  test("v08: PQ codes are per-subspace independent — a vector near " +
      "label 0 in its first subspace and label 1 in its second gets " +
      "the mixed code word; exact members reconstruct with zero error") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    // 16-dim vectors -> 2 subspaces of 8. Label-0 vectors: e0 in the
    // first subspace, e8 in the second; label-1: e1 / e9. vec 99
    // (label 0) is e0 in subspace 1 but e9 in subspace 2 — scalar
    // assignment (v02/v07) would force one cell; PQ must emit "0-1".
    def vec(a: Int, b: Int): Array[Float] = {
      val v = Array.fill(16)(0.0f); v(a) = 1.0f; v(b) = 1.0f; v
    }
    val clean0 = (0 until 4).map(i => (i.toLong, vec(0, 8), 0))
    val clean1 = (10 until 14).map(i => (i.toLong, vec(1, 9), 1))
    val mixed = (99L, vec(0, 9), 0)
    (clean0 ++ clean1 :+ mixed).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = queries.VectorSearch.v08.run(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[String]("codes"), r.getAs[Long]("sq_err_scaled"),
          r.getAs[Double]("mse")))).toMap
    assert(out.size === 9)
    // centroid 0, subspace 2 = 0.8·e8 + 0.2·e9 (the mixed member
    // pollutes it); hand-computed exact-scaled terms:
    // (1−0.8)²·1e12 + (0.2)²·1e12 = 40e9 + 40e9 = 80e9
    assert(out(0L) === (("0-0", 80000000000L, 80000000000L / 64e12)))
    // label-1 vectors ARE their centroid in both subspaces
    assert(out(10L) === (("1-1", 0L, 0.0)))
    // the mixed vector: subspace 1 exactly centroid 0, subspace 2
    // exactly centroid 1 — mixed code word, zero reconstruction error
    assert(out(99L) === (("0-1", 0L, 0.0)))
  }

  test("s10: mixture weights — sqrt temperature upsamples the small " +
      "source and the 4-epoch repeat cap binds exactly where the " +
      "allocation exceeds 4x the source") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    // big: 900 tokens, small: 100 -> sw 30e6 / 10e6, shares .75/.25,
    // budget 2000. big: target 1500 = 1.66 epochs; small: target 500
    // over 100 tokens = 5 epochs -> capped at 4 (400 eff. tokens)
    Seq((1L, ("tok " * 900).trim, "en", "big"),
      (2L, ("tok " * 100).trim, "en", "small"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.SourceQueries.s10.run(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("mix_share"),
          r.getAs[Long]("target_tokens"), r.getAs[Long]("epochs_x100"),
          r.getAs[Long]("effective_tokens")))).toMap
    assert(out("big") === ((900L, 0.75, 1500L, 166L, 1500L)))
    assert(out("small") === ((100L, 0.25, 500L, 400L, 400L)))
  }

  test("t10: corpus-trained unigram surprisal — hand-computed " +
      "floor-log2 bits and rare ratio on a 2-doc corpus") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    // vocab: a->3, b->1; total=4. bits(4)=3, bits(3)=2, bits(1)=1.
    Seq((1L, "a a", "en", "s"), (2L, "a b", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.TextAnalysis.t10.run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_surprisal_bits"),
          r.getAs[Double]("rare_ratio")))).toMap
    // doc 1 = [a, a]: per-token surprisal 3-2=1 bit -> avg 1.0;
    // a has corpus count 3 > 2, so nothing is rare
    assert(out(1L) === ((2L, 1.0, 0.0)))
    // doc 2 = [a, b]: (3-2) + (3-1) = 3 bits over 2 tokens -> 1.5;
    // b is a hapax -> rare_ratio 0.5
    assert(out(2L) === ((2L, 1.5, 0.5)))
  }

  test("t12: BM25 — hand-computed idf bits, tf normalization, and " +
      "per-term ranking on a 5-doc corpus") {
    // df(join)=2 of N=5 -> idf = len(bin(5)) - len(bin(2)) = 1 bit;
    // avgdl = 12/5 = 2.4
    val dir = docsDir(Seq(
      (1L, "join join join a a a", "en"), (2L, "join b", "en"),
      (3L, "c c", "en"), (4L, "d", "en"), (5L, "e", "en")))
    val out = queries.TextAnalysis.t12.run(spark, dir).collect()
    assert(out.length === 2) // only "join" of the 4 query terms occurs
    assert(out.forall(_.getAs[String]("token") === "join"))
    val byRank = out.map(r => r.getAs[Int]("rnk") ->
      ((r.getAs[Long]("doc_id"), r.getAs[Long]("tf"),
        r.getAs[Double]("score")))).toMap
    // same IEEE expression order as both engines' formula
    def bm25(tf: Double, dl: Double): Double =
      1.0 * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / (12.0 / 5.0))))
    // doc1 tf=3 dl=6 outranks doc2 tf=1 dl=2 (tf wins over the
    // length penalty here)
    assert(byRank(1) === ((1L, 3L, bm25(3.0, 6.0))))
    assert(byRank(2) === ((2L, 1L, bm25(1.0, 2.0))))
  }

  test("t13: bigram surprisal — hand-computed conditional bits, " +
      "novel ratio, and the 1-token-doc guard") {
    // corpus bigrams: "a a"x1 (doc1), "a b"x2 (doc1, doc2);
    // head count u(a)=3. bits: bin(3)=2, bin(1)=1, bin(2)=2.
    val dir = docsDir(Seq(
      (1L, "a a b", "en"), (2L, "a b", "en"), (3L, "solo", "en")))
    val out = queries.TextAnalysis.t13.run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"),
          r.getAs[Double]("avg_bigram_surprisal_bits"),
          r.getAs[Double]("novel_ratio")))).toMap
    // doc1: ("a a": 2-1=1 bit, corpus-hapax) + ("a b": 2-2=0) -> avg
    // 0.5, novel 0.5; doc2: one "a b" -> 0 bits, nothing novel
    assert(out(1L) === ((2L, 0.5, 0.5)))
    assert(out(2L) === ((1L, 0.0, 0.0)))
    // a 1-token doc has no bigram positions: absent, not a
    // descending-sequence artifact row
    assert(!out.contains(3L))
  }

  private def embDir(rows: Seq[(Long, Array[Float], Int)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("v11: binary-quant search — hamming counts sign flips, rerank " +
      "orders by exact cosine, and the candidate cap is a real filter") {
    // query vec_id=0 (0 % 50 = 0): all-positive signs. Corpus:
    //  1  = identical            -> hamming 0, cosine 1
    //  2  = one sign flipped     -> hamming 1
    //  3  = all flipped          -> hamming 64, cosine -1
    //  4  = THREE tiny-magnitude flips: cosine ≈ 1 (better than 2's)
    //       but hamming 3
    //  10..29 = twenty vectors with two big flips -> hamming 2
    // top-20 candidates by (hamming, id) = {1, 2, 10..27} — vec 4
    // ranks below the candidate cap on hamming and must be EXCLUDED
    // even though its exact cosine (≈0.976) beats every hamming-2
    // vector's (0.9375) — the approximate contract of the
    // compressed-domain prefilter.
    def vec(flips: Seq[Int], mag: Float): Array[Float] =
      Array.tabulate(64)(i => if (flips.contains(i)) -mag else 0.5f)
    val rows =
      Seq((0L, vec(Nil, 0f), 0), (1L, vec(Nil, 0f), 0),
        (2L, vec(Seq(0), 0.5f), 0), (3L, vec(0 until 64, 0.5f), 0),
        (4L, vec(Seq(0, 1, 2), 0.001f), 0)) ++
        (10L to 29L).map(i =>
          (i, vec(Seq(i.toInt % 32, 32 + i.toInt % 32), 0.5f), 0))
    val out = queries.VectorSearch.v11.run(spark, embDir(rows))
      .collect().filter(_.getAs[Long]("q_id") === 0L)
      .sortBy(_.getAs[Int]("rnk"))
    assert(out.length === 5)
    val top = out.head
    assert(top.getAs[Long]("neighbor_id") === 1L)
    assert(top.getAs[Long]("hamming") === 0L)
    // identical vector: cosine 1 up to the sqrt rounding ulp
    assert(math.abs(top.getAs[Double]("cosine") - 1.0) < 1e-12)
    // rank 2 = the hamming-1 vector (highest cosine among candidates)
    assert(out(1).getAs[Long]("neighbor_id") === 2L)
    // vec 4 (better cosine, hamming rank 21) and vec 3 (hamming 64)
    // never appear
    assert(!out.exists(r => Seq(3L, 4L)
      .contains(r.getAs[Long]("neighbor_id"))))
  }

  test("v17: IVFPQ rerank — ADC ties enter the pool by id, exact " +
      "refine reorders inside it, and the pool cap is a real filter") {
    def vec(overrides: Map[Int, Float], base: Float): Array[Float] =
      Array.tabulate(64)(i => overrides.getOrElse(i, base))
    // Query 0 = all 0.5. Corpus ids 1..30 all label 0 and all encode
    // to the SAME code word (their values hug the label-0 centroid),
    // so their ADC distances are IDENTICAL — the pool is ids 1..20 by
    // the neighbor_id tie-break. Only id 7 is an exact copy of the
    // query; the rest are slightly off at dim 0. Label-1 vectors sit
    // at -0.5: a far second cell so the probe has something to prune.
    val rows =
      Seq((0L, vec(Map.empty, 0.5f), 0)) ++
        (1L to 30L).map { i =>
          if (i == 7L) (i, vec(Map.empty, 0.5f), 0)
          else (i, vec(Map(0 -> 0.4f), 0.5f), 0)
        } ++
        Seq((40L, vec(Map.empty, -0.5f), 1),
          (41L, vec(Map(1 -> -0.4f), -0.5f), 1))
    val out = queries.VectorSearch.v17.run(spark, embDir(rows))
      .collect().filter(_.getAs[Long]("q_id") == 0L)
      .sortBy(_.getAs[Int]("rnk"))
    assert(out.length === 5)
    // the pool cap excludes ids 21..30 regardless of their cosine —
    // the approximate contract of the compressed-domain first stage
    assert(!out.exists(_.getAs[Long]("neighbor_id") > 20L))
    // exact refine reorders INSIDE the pool: the exact copy (adc_rnk
    // 7 — ADC is blind to it, ranking purely by id among ties) beats
    // the ADC-rank-1 vector once raw floats are rescored
    val top = out.head
    assert(top.getAs[Long]("neighbor_id") === 7L)
    assert(top.getAs[Int]("adc_rnk") === 7)
    assert(math.abs(top.getAs[Double]("cosine") - 1.0) < 1e-12)
    assert(out(1).getAs[Long]("neighbor_id") === 1L)
    assert(out(1).getAs[Double]("cosine") < 1.0 - 1e-6)
  }

  test("v18: refine recall — the exact rerank recovers the true " +
      "neighbor ADC demoted, strictly beating raw IVFPQ") {
    // v17's spec corpus: truth top-5 for query 0 = {7, 1, 2, 3, 4}
    // (7 is the exact copy); all label-0 vectors tie on ADC, so raw
    // IVFPQ's top-5 = {1..5} by id (misses 7 → 4 hits) while the
    // refine pool (top-20) still holds 7 and reranks it first
    // (5 hits). The report must show exactly that gap.
    def vec(overrides: Map[Int, Float], base: Float): Array[Float] =
      Array.tabulate(64)(i => overrides.getOrElse(i, base))
    val rows =
      Seq((0L, vec(Map.empty, 0.5f), 0)) ++
        (1L to 30L).map { i =>
          if (i == 7L) (i, vec(Map.empty, 0.5f), 0)
          else (i, vec(Map(0 -> 0.4f), 0.5f), 0)
        } ++
        Seq((40L, vec(Map.empty, -0.5f), 1),
          (41L, vec(Map(1 -> -0.4f), -0.5f), 1))
    val out = queries.VectorSearch.v18.run(spark, embDir(rows))
      .collect().filter(_.getAs[Long]("q_id") == 0L)
      .map(r => r.getAs[String]("method") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Double]("recall_at_5"))))
      .toMap
    assert(out("ivfpq") === ((4L, 0.8)))
    assert(out("ivfpq_refine") === ((5L, 1.0)))
  }

  test("q26: column profiler — nulls counted per column, exact " +
      "distincts, DECIMAL-exact mean skips nulls, string min/max") {
    // the driver testdata has no nulls, so the null paths (COUNT
    // difference, mean's null-skip, NULLIF guard) only exercise here
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    val rows = Seq(
      (1L, Option(10L), Option(2.0), Option("click"), "O"),
      (2L, Option(10L), Option(4.0), Option("view"), "O"),
      (3L, Option.empty[Long], Option.empty[Double],
        Option.empty[String], "F"))
    rows.toDF("event_id", "user_id", "value", "event_type", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = queries.Relational.q26.run(spark, dir).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out.size === 5)
    assert(out.values.forall(_.getAs[Long]("n_rows") === 3L))
    val v = out("value")
    assert(v.getAs[Long]("n_null") === 1L)
    assert(v.getAs[Long]("n_distinct") === 2L)
    assert(v.getAs[Double]("min_num") === 2.0)
    assert(v.getAs[Double]("max_num") === 4.0)
    assert(v.getAs[Double]("mean_num") === 3.0) // (2+4)/2 — null skipped
    val u = out("user_id")
    assert(u.getAs[Long]("n_null") === 1L)
    assert(u.getAs[Long]("n_distinct") === 1L)
    assert(u.getAs[Double]("mean_num") === 10.0)
    val t = out("event_type")
    assert(t.getAs[Long]("n_null") === 1L)
    assert(t.getAs[Long]("n_distinct") === 2L)
    assert(t.getAs[String]("min_str") === "click")
    assert(t.getAs[String]("max_str") === "view")
    assert(t.isNullAt(t.fieldIndex("mean_num")))
    assert(out("props").getAs[Long]("n_distinct") === 2L)
    assert(out("event_id").getAs[Long]("n_distinct") === 3L)
  }

  test("t14: Zipf audit — hand-computed integer-moment slope: steep " +
      "for a Zipf source, exactly 0 for uniform, NULL when degenerate") {
    // s1 counts a=8 b=4 c=2 d=1: ranks 1..4, x=bits(rank)=(1,2,2,3),
    // y=bits(count)=(4,3,2,1) -> slope = (4·17−8·10)/(4·18−64) = −1.5
    // s2 counts e=f=g=2: y constant -> slope exactly 0
    // s3 one token: 1 vocab point -> denominator 0 -> NULL
    val dir = docsDir(Seq(
      (1L, "a a a a a a a a b b b b c c d", "en"),
      (2L, "e e f f g g", "en"),
      (3L, "z", "en")),
      sources = Seq("s1", "s2", "s3"))
    val out = queries.TextAnalysis.t14.run(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("s1").getAs[Long]("n_vocab") === 4L)
    assert(out("s1").getAs[Long]("n_tokens") === 15L)
    assert(out("s1").getAs[Double]("top_share") === 8.0 / 15)
    assert(out("s1").getAs[Double]("zipf_slope_bits") === -1.5)
    assert(out("s2").getAs[Double]("zipf_slope_bits") === 0.0)
    assert(out("s3").isNullAt(out("s3").fieldIndex("zipf_slope_bits")))
  }

  test("v12: truncated-dim recall — prefix ranking is blind to " +
      "suffix-only differences (recall 0) and exact when the signal " +
      "is in the prefix (recall 1)") {
    def vec(flips: Seq[Int]): Array[Float] =
      Array.tabulate(64)(i => if (flips.contains(i)) -0.5f else 0.5f)
    // case A: all differences live in dims 33..64. Truth = the five
    // 1-flip vectors {6..10}; every prefix cosine ties at 1.0, so the
    // truncated rank falls to the neighbor_id tiebreak and picks the
    // five heavy-flip vectors {1..5} -> recall 0 at BOTH widths.
    val a = Seq((0L, vec(Nil), 0)) ++
      (1L to 5L).map(i => (i, vec(32 until 48), 0)) ++
      (6L to 10L).map(i => (i, vec(Seq(32 + i.toInt)), 0))
    val outA = queries.VectorSearch.v12.run(spark, embDir(a))
      .collect().filter(_.getAs[Long]("q_id") === 0L)
    assert(outA.length === 2) // one row per truncation width
    outA.foreach { r =>
      assert(r.getAs[Double]("recall_at_5") === 0.0,
        s"width ${r.getAs[Int]("trunc_dims")}")
    }
    // case B: all differences live in dims 1..2 — visible at width
    // 16, so truncated ranking reproduces the exact order -> recall 1.
    val b = Seq((0L, vec(Nil), 0)) ++
      (1L to 5L).map(i => (i, vec(Seq(0)), 0)) ++
      (6L to 10L).map(i => (i, vec(Seq(0, 1)), 0))
    val outB = queries.VectorSearch.v12.run(spark, embDir(b))
      .collect().filter(_.getAs[Long]("q_id") === 0L)
    assert(outB.length === 2)
    outB.foreach { r =>
      assert(r.getAs[Double]("recall_at_5") === 1.0,
        s"width ${r.getAs[Int]("trunc_dims")}")
    }
  }

  test("v13: hybrid RRF — both-list fusion outranks either single " +
      "list, stop-tokens are df-capped out of the lexical side, and " +
      "one-sided candidates survive the full outer fusion") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    // 26 docs. n_docs = 26 so the stop cap keeps df <= 2 tokens:
    // alpha/beta/zeta (df 2, idf bits = len(bin(26)) - len(bin(2)) = 3)
    // are kept; "common" (df 23) is capped out, so docs 3..24 share
    // nothing lexical with the query despite the verbatim overlap.
    val docRows =
      Seq((0L, "alpha beta zeta common", "en"),
        (1L, "alpha gamma", "en"),
        (2L, "beta delta", "en"),
        (25L, "zeta filler25", "en")) ++
        (3L to 24L).map(i => (i, s"common filler$i", "en"))
    docRows.toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    // embeddings for ids 0..24 only — doc 25 is lexical-only. Query
    // id 0 = e_x; id 2 = e_x (cos 1, sem rank 1); id 5 tilts slightly
    // (cos ~0.995, rank 2); everyone else is e_y (cos 0, ranks 3.. in
    // id order: doc1 r3, doc3 r4, doc4 r5, ...).
    def vec(x: Float, y: Float): Array[Float] =
      Array.tabulate(64)(i => if (i == 0) x else if (i == 1) y else 0f)
    val embRows =
      Seq((0L, vec(1f, 0f), 0), (2L, vec(1f, 0f), 0),
        (5L, vec(1f, 0.1f), 0)) ++
        (Seq(1L) ++ (3L to 24L).filter(_ != 5L))
          .map(i => (i, vec(0f, 1f), 0))
    embRows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = queries.VectorSearch.v13.run(spark, dir).collect()
      .sortBy(_.getAs[Int]("rrf_rank"))
    assert(out.length === 10) // one query (id 0), top-10
    assert(out.forall(_.getAs[Long]("q_id") === 0L))
    assert(!out.exists(_.getAs[Long]("doc_id") === 0L)) // self excluded
    def ranks(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"),
        Option(r.get(r.fieldIndex("lex_rank"))),
        Option(r.get(r.fieldIndex("sem_rank"))))
    // doc2 is in BOTH lists (lex r2: tie with doc1 broken by id;
    // sem r1) -> 1/62 + 1/61 beats doc1's lex r1 + sem r3.
    assert(ranks(out(0)) === ((2L, Some(2), Some(1))))
    assert(ranks(out(1)) === ((1L, Some(1), Some(3))))
    // doc5: semantic-only (cos ~0.995) -> null lex_rank survives
    assert(ranks(out(2)) === ((5L, None, Some(2))))
    // doc25: lexical-only (zeta, no embedding) -> null sem_rank
    assert(ranks(out(3)) === ((25L, Some(3), None)))
    // the capped "common" token contributes nothing: docs 3..24 all
    // have NULL lex_rank (sem-only tail, ranked by id tiebreak)
    assert(out.drop(4).map(_.getAs[Long]("doc_id")).toSeq ===
      Seq(3L, 4L, 6L, 7L, 8L, 9L))
    assert(out.drop(4).forall(r => r.isNullAt(r.fieldIndex("lex_rank"))))
    // fused score is exactly the two fixed-order divisions
    assert(out(0).getAs[Double]("rrf_score") === 1.0 / 62 + 1.0 / 61)
    assert(out(3).getAs[Double]("rrf_score") === 1.0 / 63)
  }

  test("d14: semantic dedup — chain minima survive, the exists-rule " +
      "drops against dropped neighbors too, and sub-target corpora " +
      "degrade to ONE cell (k = ceil(N/128) = exact brute dedup)") {
    // N = 6 < 128 → auto-k gives k = 1: every vector shares the one
    // seed-Voronoi cell, so the decision is the exact all-pairs rule.
    // Unit circle at 0°/60°/120° in dims (0,1) — cos(1,2)=0.5 ≥ τ,
    // cos(2,3)=0.5 ≥ τ, cos(1,3)=−0.5 < τ: an ε-chain. Vec 4 at −90°
    // (cos ≤ 0 to all — kept). Vecs 5,6: parallel along dim 2
    // (cos(5,6)=1), orthogonal to the rest.
    def v(x: Float, y: Float, z: Float): Array[Float] =
      Array(x, y, z, 0f)
    val dir = embDir(Seq(
      (1L, v(1f, 0f, 0f), 0),
      (2L, v(0.5f, 0.866f, 0f), 0),
      (3L, v(-0.5f, 0.866f, 0f), 0),
      (4L, v(0f, -1f, 0f), 0),
      (5L, v(0f, 0f, 5f), 1),
      (6L, v(0f, 0f, 4.5f), 1)))
    val out = queries.VectorSearch.d14.run(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Boolean]("kept"),
          Option(r.get(r.fieldIndex("dup_of")))))).toMap
    assert(out.size === 6)
    assert(out(1L) === ((true, None))) // chain minimum survives
    assert(out(2L) === ((false, Some(1L))))
    // 3 is far from 1 (cos −0.5) but near DROPPED 2 — the ∃-rule
    // still drops it, pointing at 2 (the d07-canonical approximation
    // without the transitive closure)
    assert(out(3L) === ((false, Some(2L))))
    assert(out(4L) === ((true, None))) // dissimilar cell-mate kept
    assert(out(5L) === ((true, None)))
    // 6 ∥ 5 (cos 1) — dropped even in the one-cell regime
    assert(out(6L) === ((false, Some(5L))))
    // the one-cell regime reports a single cell id: the min vec_id
    assert(queries.VectorSearch.d14.run(spark, dir).collect()
      .forall(_.getAs[Long]("cell") === 1L))
  }

  test("d14 auto-k: past the 128-vector target the corpus splits " +
      "into k = ceil(N/128) seed-Voronoi cells, perturbed copies " +
      "co-assign, and cross-cluster pairs never form candidates") {
    // 300 vectors in two tight antipodal clusters along dim 0 → k = 3
    // seeds (vec_ids 0,1,2), k1 = 2 coarse. Within a cluster every
    // pair has cos ≈ 1 ≥ τ; across clusters cos ≈ −1 < τ. The keep
    // set must be exactly one chain minimum per cluster REACHABLE in
    // its cell — i.e. per (cell × cluster) the min id survives.
    val rnd = new scala.util.Random(7)
    def jitter(base: Float): Array[Float] =
      Array(base + rnd.nextFloat() * 0.01f - 0.005f,
        rnd.nextFloat() * 0.01f, rnd.nextFloat() * 0.01f, 0f)
    val vecs = (0L until 300L).map { i =>
      (i, jitter(if (i % 2 == 0) 1f else -1f), (i % 2).toInt)
    }
    val dir = embDir(vecs)
    val out = queries.VectorSearch.d14.run(spark, dir).collect()
    assert(out.length === 300)
    val byCell = out.groupBy(_.getAs[Long]("cell"))
    assert(byCell.size > 1, "expected >1 auto-k cell at N=300")
    // dup_of pointers never cross the cos-τ boundary: a +1-cluster
    // vector (even id) never points at a −1-cluster vector (odd id)
    out.filter(!_.isNullAt(2)).foreach { r =>
      assert(r.getAs[Long]("vec_id") % 2 === r.getAs[Long]("dup_of") % 2)
    }
    // within each cell, every same-cluster non-minimum drops
    byCell.foreach { case (_, rows) =>
      rows.groupBy(_.getAs[Long]("vec_id") % 2).foreach {
        case (_, grp) =>
          val minId = grp.map(_.getAs[Long]("vec_id")).min
          grp.foreach { r =>
            val kept = r.getAs[Boolean]("kept")
            if (r.getAs[Long]("vec_id") == minId) assert(kept)
            else assert(!kept,
              s"vec ${r.getAs[Long]("vec_id")} should have dropped")
          }
      }
    }
  }

  test("s11: curation composition — the duplicate member drops " +
      "before the quality gate, and the report lands at the " +
      "(split, source) grain") {
    import spark.implicits._
    // ids whose s02 hash bucket is on the train side, so the whole
    // fixture reports under one split (s06's bucket-probing trick)
    val buckets = spark.range(1, 200)
      .select(col("id"),
        (functions.Fns.hash60(col("id").cast("string")) % 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val train = buckets.filter(_._2 < 80).keys.toSeq.sorted
    // 60 words, ≥2 stopwords, mean length in-bounds: passes t09
    val goodA = (Seq("the", "and") ++ (1 to 58).map(i => s"word$i"))
      .mkString(" ")
    // same quality shape, disjoint vocabulary: never minhash-pairs
    val goodB = (Seq("the", "and") ++ (1 to 58).map(i => s"other$i"))
      .mkString(" ")
    val short = "the and tiny" // fails the word-count rule
    val dir = docsDir(Seq(
      (train(0), goodA, "en"), // canonical of the dup pair
      (train(1), goodA, "en"), // identical text -> removed as dup
      (train(2), short, "en"), // removed by the quality gate
      (train(3), goodB, "en")), // kept
      sources = Seq("s", "s", "s", "s"))
    val out = queries.SourceQueries.s11.run(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("split") === "train")
    assert(r.getAs[String]("source") === "s")
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("n_kept") === 2L)
    assert(r.getAs[Long]("n_removed_dup") === 1L)
    assert(r.getAs[Long]("n_removed_quality") === 1L)
    assert(r.getAs[Long]("tokens_kept") === 120L)
  }

  test("s12: canary scan — non-overlapping occurrence arithmetic, " +
      "multi-hit docs, and zero-hit canaries still report") {
    val dir = docsDir(Seq(
      (1L, "table part a x table part a", "en"), // two hits, one doc
      (2L, "scan query big", "en"),
      (3L, "nothing of note", "en")),
      sources = Seq("s", "s", "s"))
    val out = queries.SourceQueries.s12.run(spark, dir).collect()
      .map(r => r.getAs[String]("canary") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_occurrences"),
          Option(r.get(r.fieldIndex("first_doc_id")))))).toMap
    assert(out.size === 4) // every canary reports, hits or not
    assert(out("table part a") === ((1L, 2L, Some(1L))))
    assert(out("scan query big") === ((1L, 1L, Some(2L))))
    assert(out("value fast spark") === ((0L, 0L, None)))
    assert(out("canary-724-never-in-corpus") === ((0L, 0L, None)))
  }

  test("s13: DSIR weights — target-shared bigrams score up, " +
      "target-absent bigrams cancel to the smoothing floor, exact " +
      "integer bits arithmetic") {
    val dir = docsDir(Seq(
      (1L, "aa bb aa bb aa", "en"), // 4 bigrams, all target-heavy
      (2L, "aa bb cc", "en"),
      (3L, "xx yy xx yy", "de"), // 3 bigrams, none in target
      (4L, "aa bb dd", "de")), // one target-shared bigram
      sources = Seq("s", "s", "s", "s"))
    // models: target (en) aa-bb:3 bb-aa:2 bb-cc:1, Nt=6; source
    // aa-bb:4 bb-aa:2 bb-cc:1 xx-yy:2 yy-xx:1 bb-dd:1, Ns=11.
    // constant bits(11)−bits(6) = 4−3 = 1 per bigram occurrence.
    // doc1: 2·(bits(4)−bits(5)+1) + 2·(bits(3)−bits(3)+1) = 4
    // doc2: (3−3+1) + (bits(2)−bits(2)+1)                 = 2
    // doc3: 2·(bits(1)−bits(3)+1) + (bits(1)−bits(2)+1)   = 0
    // doc4: (3−3+1) + (bits(1)−bits(2)+1)                 = 1
    val out = queries.SourceQueries.s13.run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("log_ratio_bits"),
          r.getAs[Int]("sel_rank"), r.getAs[Boolean]("selected"))))
      .toMap
    assert(out.size === 4)
    assert(out(1L) === ((4L, 4L, 1, true)))
    assert(out(2L) === ((2L, 2L, 2, true)))
    assert(out(4L) === ((2L, 1L, 3, true)))
    assert(out(3L) === ((3L, 0L, 4, true)))
  }

  test("property: takeWeightBudget ≡ per-stratum prefix scan of the " +
      "(hash, id)-sorted rows (seeded random strata/weights)") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (1 to 120).map { i =>
      (i.toLong, s"s${rnd.nextInt(5)}", (1 + rnd.nextInt(50)).toLong)
    }
    val budget = 120L
    val df = rows.toDF("doc_id", "source", "n_tokens")
    val got = operators.Sampling.takeWeightBudget(
        df, col("doc_id"), col("source"), col("n_tokens"), budget)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("cum_weight")).toMap
    // reference: sort each stratum by (hash60(id), id), take while the
    // running total stays within budget
    val hv = df.select(col("doc_id"),
        functions.Fns.hash60(col("doc_id").cast("string")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = rows.groupBy(_._2).values.flatMap { stratum =>
      var cum = 0L
      stratum.sortBy { case (id, _, _) => (hv(id), id) }.flatMap {
        case (id, _, w) =>
          cum += w
          if (cum <= budget) Some(id -> cum) else None
      }
    }.toMap
    assert(got === expect)
  }

  test("s18: z-order layout — Morton tiles bound BOTH dims' zone maps " +
      "where the linear layout leaves one dim unprunable") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    // a 64×64 grid: one event per (user 0..63, hour 0..63) cell.
    // Normalization maps u → nu = 4u exactly (and h likewise), so
    // zkey = Morton(u, h) · 16 and the 4096 distinct codes cut into
    // 32 aligned blocks of 128 — each a 8-user × 16-hour Morton tile.
    val evs = for (u <- 0L until 64L; h <- 0 until 64) yield
      (u * 64 + h, new java.sql.Timestamp(h.toLong * 3600000L), u, "t")
    evs.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val out = queries.SourceQueries.s18.run(spark, dir).collect()
    val z = out.filter(_.getAs[String]("layout") == "zorder")
    val l = out.filter(_.getAs[String]("layout") == "linear")
    assert(z.length === 32 && l.length === 32)
    assert(out.forall(_.getAs[Long]("n_rows") === 128L))
    // linear (time-ordered ingestion): each file = 2 full hours × ALL
    // users — perfect pruning on time, NONE on user
    assert(l.forall(_.getAs[Double]("user_span_frac") === 1.0))
    assert(l.forall(_.getAs[Double]("hr_span_frac") === 2.0 / 64))
    // z-order: every file is an aligned 8×16 tile — both dims bounded
    assert(z.forall(_.getAs[Double]("user_span_frac") === 8.0 / 64))
    assert(z.forall(_.getAs[Double]("hr_span_frac") === 16.0 / 64))
    // hand-checked interleave: the first tile is users 0..7 × hours
    // 0..15 (z bits 1,3,5 ← user, bits 0,2,4,6 ← hour)
    val f1 = z.find(_.getAs[Int]("file_id") == 1).get
    assert(f1.getAs[Long]("min_user") === 0L)
    assert(f1.getAs[Long]("max_user") === 7L)
    assert(f1.getAs[Long]("min_hr") === 0L)
    assert(f1.getAs[Long]("max_hr") === 15L)
  }

  test("s18: fewer rows than files — the q=0 NTILE branch: one row " +
      "per file, ids 1..N, per-file spans collapse to points") {
    // N=5 < 32 files → NTILE's q = N div 32 = 0 and r = N: every rank
    // lands in the first CASE branch ((rank-1) div 1 + 1 = rank); the
    // ELSE's div-by-q is unreachable. Exercises the arithmetic edge
    // the sf corpora (N ≫ 32) never hit.
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    (0 until 5).map(i =>
        (i.toLong, new java.sql.Timestamp(i.toLong * 3600000L), i.toLong, "t"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val out = queries.SourceQueries.s18.run(spark, dir).collect()
    assert(out.length === 10) // 5 files × 2 layouts
    assert(out.forall(_.getAs[Long]("n_rows") === 1L))
    out.groupBy(_.getAs[String]("layout")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("file_id")).sorted.toSeq
        === Seq(1, 2, 3, 4, 5))
    }
    // single-row files: min == max on both dims
    assert(out.forall(r => r.getAs[Long]("min_user") ===
      r.getAs[Long]("max_user")))
  }

  test("e19: hourly anomaly — 5x spike over a flat baseline flags, " +
      "steady hours and short-history types don't, integer z-algebra") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    def rows(tpe: String, hour: Int, n: Int, idBase: Long) =
      (1 to n).map(i => (idBase + i,
        new java.sql.Timestamp(hour.toLong * 3600000L), 1L, tpe))
    // type x: hours 0..25 flat at 10 events, hour 26 spikes to 50
    // type y: only 3 observed hours (1,1,9) — never enough baseline
    val evs =
      (0 to 25).flatMap(h => rows("x", h, 10, h * 100L)) ++
        rows("x", 26, 50, 2600L) ++
        rows("y", 0, 1, 10000L) ++ rows("y", 1, 1, 10100L) ++
        rows("y", 2, 9, 10200L)
    evs.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val out = queries.EventAnalytics.e19.run(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("bucket_ms") / 3600000L) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_baseline"),
          r.getAs[Boolean]("is_spike")))).toMap
    assert(out.size === 30)
    // the spike hour: 24-observed-hour baseline, flat 10s, c=50
    assert(out(("x", 26L)) === ((50L, 24L, true)))
    // steady hours never flag (n·c − Σc = 0 fails the strict >0)
    (1 to 25).foreach { h =>
      assert(out(("x", h.toLong))._3 === false, s"hour $h")
    }
    assert(out(("x", 0L)) === ((10L, 0L, false))) // no history
    // y's 9-event jump has only 2 baseline hours (< 6) — no verdict
    assert(out(("y", 2L)) === ((9L, 2L, false)))
  }

  test("g03: PageRank — a symmetric 2-cycle is the exact fixed point, " +
      "a dangling sink accumulates while its source decays, integer " +
      "floor arithmetic to the last digit") {
    import spark.implicits._
    def evDir(rows: Seq[(Long, Long, String)]): String = {
      val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
      rows.toDF("user_id", "event_id", "event_type")
        .write.parquet(s"$dir/events.parquet")
      dir
    }
    def ranks(dir: String): Map[String, Long] =
      queries.GraphQueries.g03.run(spark, dir).collect()
        .map(r => r.getAs[String]("event_type") ->
          r.getAs[Long]("rank_scaled")).toMap
    // case A: a→b and b→a (one user: a,b,a) — perfectly symmetric,
    // so r stays S/2 forever: 75e9 base + ((5e11·17)//20)·c//out
    // = 75e9 + 425e9 = 5e11 at every iteration, both nodes.
    val a = ranks(evDir(Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"))))
    assert(a === Map("a" -> 500000000000L, "b" -> 500000000000L))
    // case B: a→b only; b dangles (leaks). r0 = 5e11 each.
    // i1: r(a) = 75e9; r(b) = 75e9 + (5e11·17)//20 = 5e11.
    // i2+: contrib from a is ((75e9·17)//20) = 63_750_000_000,
    // stable → r(b) = 138_750_000_000 from i2 on.
    val b = ranks(evDir(Seq((1L, 1L, "a"), (1L, 2L, "b"))))
    assert(b === Map("a" -> 75000000000L, "b" -> 138750000000L))
  }

  test("v15: MMR picks the diverse moderate-relevance candidate " +
      "second, ahead of near-duplicates of the greedy top hit") {
    // query 0 → cluster {1,2,3} (cos ≈ 0.99, mutually ≈ identical)
    // plus one off-axis candidate 4 (cos = 0.3, ≈ 0.3 to the cluster)
    val dir = embDir(Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.99f, 0.14f, 0f, 0f), 0),
      (2L, Array(0.99f, 0.141f, 0f, 0f), 0),
      (3L, Array(0.985f, 0.17f, 0f, 0f), 0),
      (4L, Array(0.3f, 0f, 0.954f, 0f), 1)))
    val out = queries.VectorSearch.v15.run(spark, dir).collect()
      .sortBy(_.getAs[Long]("sel_rank"))
    assert(out.length === 4) // pool exhausted below MmrK
    // plain cosine order is 1,2,3,4 — MMR trades 2 for the diverse 4
    assert(out.map(_.getAs[Long]("neighbor_id")).take(2).toSeq ===
      Seq(1L, 4L))
    assert(out.head.isNullAt(out.head.fieldIndex("max_sim_prior")))
    assert(out(1).getAs[Double]("max_sim_prior") < 0.35)
    assert(out(1).getAs[Double]("relevance") <
      out(2).getAs[Double]("relevance")) // non-greedy order visible
  }

  test("v16: kNN graph — in-cell exact top-k ordering; sign-flipped " +
      "and cross-label vectors are isolated nodes") {
    val one = Array.fill(7)(1f)
    val dir = embDir(Seq(
      (1L, 1f +: one, 0), // cell 255
      (2L, 0.9f +: one, 0), // cell 255, closest to 1
      (3L, 0.5f +: one, 0), // cell 255, farther
      (4L, -1f +: one, 0), // dim-1 sign flip → cell 254: isolated
      (5L, 1f +: one, 1))) // other label, same cell: isolated
    val out = queries.VectorSearch.v16.run(spark, dir).collect()
    val by = out.groupBy(_.getAs[Long]("vec_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rnk"))
        .map(_.getAs[Long]("neighbor_id")).toSeq).toMap
    assert(by.keySet === Set(1L, 2L, 3L)) // 4 and 5 isolated
    assert(by(1L) === Seq(2L, 3L)) // exact cosine order
    assert(by(2L) === Seq(1L, 3L))
    assert(by(3L) === Seq(2L, 1L)) // 2 is nearer 3 than 1 is
  }

  test("v14: retrieval metrics ≡ plain Scala recomputation from the " +
      "methods' own outputs (MRR, integer-bits DCG, per-query IDCG)") {
    val dir = "/root/testdata/sf0.001"
    val S = 1000000000000L
    def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val truth = queries.VectorSearch.v01.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
    val truthByQ = truth.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def lists(df: org.apache.spark.sql.DataFrame, id: String,
        rk: String): Map[(Long, Long), Long] =
      df.collect().map(r => (r.getAs[Long]("q_id"),
        r.getAs[Long](id)) -> r.getAs[Int](rk).toLong).toMap
    val methods = Map(
      "v03_lsh" -> lists(queries.VectorSearch.v03.run(spark, dir),
        "neighbor_id", "rnk"),
      "v13_rrf" -> lists(queries.VectorSearch.v13.run(spark, dir),
        "doc_id", "rrf_rank"))
    val got = queries.VectorSearch.v14.run(spark, dir).collect()
      .map(r => (r.getAs[String]("method"), r.getAs[Long]("q_id")) -> r)
      .toMap
    assert(got.size === methods.size * truthByQ.size)
    for ((method, list) <- methods; (q, tset) <- truthByQ) {
      val hits = list.collect {
        case ((`q`, n), rnk) if tset.contains(n) => rnk
      }.toSeq
      val dcg = hits.map(r => S / bits(r + 1)).sum
      val idcg = (1 to tset.size).map(i => S / bits(i + 1L)).sum
      val row = got((method, q))
      assert(row.getAs[Long]("n_hits") === hits.size.toLong, s"$method $q")
      assert(Option(row.get(row.fieldIndex("first_hit_rank"))) ===
        (if (hits.isEmpty) None else Some(hits.min)), s"$method $q")
      assert(row.getAs[Long]("mrr_scaled") ===
        (if (hits.isEmpty) 0L else S / hits.min), s"$method $q")
      assert(row.getAs[Long]("dcg_scaled") === dcg, s"$method $q")
      assert(row.getAs[Long]("idcg_scaled") === idcg, s"$method $q")
      assert(row.getAs[Double]("ndcg") === dcg.toDouble / idcg.toDouble,
        s"$method $q")
    }
  }

  test("v09/v10 degenerate vectors: a null query slot drops without " +
      "crashing, empty vectors vanish, and a longer corpus vector " +
      "scores a partial sum (the oracle's join semantics)") {
    import spark.implicits._
    // id 0 is the %50 query slot and its embedding is NULL — the old
    // LUT collect NPE'd here; the oracle just emits no rows for it.
    // id 3 is empty (absent everywhere); id 4 is LONGER than the
    // query span — its extra subspaces have no LUT entries and must
    // contribute nothing, not poison the neighbor to null.
    val rows: Seq[(Long, Option[Array[Float]], Int)] = Seq(
      (0L, None, 0),
      (1L, Some(Array.fill(8)(0.5f)), 0),
      (2L, Some(Array.fill(8)(-0.5f)), 1),
      (3L, Some(Array.empty[Float]), 0),
      (4L, Some(Array.fill(16)(0.5f)), 1),
      (50L, Some(Array.fill(8)(0.4f)), 0)) // the only live query
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val v09 = queries.VectorSearch.v09.run(spark, dir).collect()
    assert(v09.nonEmpty)
    assert(v09.forall(_.getAs[Long]("q_id") === 50L)) // null slot gone
    val neighbors = v09.map(_.getAs[Long]("neighbor_id")).toSet
    assert(neighbors.contains(4L)) // longer vector: partial sum, kept
    assert(!neighbors.contains(3L)) // empty vector: absent
    val v10 = queries.VectorSearch.v10.run(spark, dir).collect()
    assert(v10.forall(_.getAs[Long]("q_id") === 50L))
  }

  test("d14/v07: empty-array embeddings are absent from assignment " +
      "(oracle's unnest emits no rows for them)") {
    val dir = embDir(Seq(
      (1L, Array.fill(4)(1.0f), 0),
      (2L, Array.empty[Float], 0), // must not appear anywhere
      (3L, Array.fill(4)(-1.0f), 1)))
    val d14 = queries.VectorSearch.d14.run(spark, dir).collect()
    assert(d14.map(_.getAs[Long]("vec_id")).toSet === Set(1L, 3L))
    val v07 = queries.VectorSearch.v07.run(spark, dir).collect()
    assert(v07.map(_.getAs[Long]("n_members")).sum === 2L)
  }

  test("d14: the only embedding rows collected are the ⌈√k⌉ coarse " +
      "seeds — the driver sync is O(√k·d), not O(k·d)") {
    // VERDICT r8 ask #3: the seed table must stay distributed. At
    // sf0.1 (2000 vectors, target cell 128): k = 16, k1 = 4 — the
    // coarse collect returns exactly k1 rows, ascending by vec_id
    // (the tie contract both engines share).
    val dir = "/root/testdata/sf0.1"
    val nemb = Tables.load(spark, dir, "embeddings")
      .filter(size(col("embedding")) > 0)
    val n = nemb.count()
    val k = ((n + 127) / 128).toInt
    val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
    val coarse = queries.VectorSearch.d14Coarse(nemb, k1)
    assert(coarse.length === k1)
    assert(k1 * k1 <= k + 2 * math.sqrt(k.toDouble).toInt + 1,
      s"k1=$k1 is not O(sqrt(k=$k))")
    assert(coarse.map(_._1).toSeq === coarse.map(_._1).sorted.toSeq)
  }

  test("property: g03's overflow-free split contribution ≡ BigInt " +
      "reference on edge counts past 64-bit products (seeded)") {
    val rnd = new scala.util.Random(99)
    (1 to 20000).foreach { _ =>
      val out = 1L + (rnd.nextLong() & Long.MaxValue) % (Long.MaxValue / 2)
      val c = 1L + (rnd.nextLong() & Long.MaxValue) % out // c <= out
      val r17 = (rnd.nextLong() & Long.MaxValue) % 850000000001L
      val split = (r17 / out) * c + ((BigInt(r17 % out) * c) / out).toLong
      val ref = (BigInt(r17) * c / out).toLong
      assert(split === ref, s"r17=$r17 c=$c out=$out")
    }
  }

  test("property: s14 ≡ plain Scala window fold on random docs " +
      "(seeded)") {
    val rnd = new scala.util.Random(41)
    val docs = (1L to 40L).map { id =>
      val n = 1 + rnd.nextInt(200)
      (id, (0 until n).map(_ => s"w${rnd.nextInt(30)}").mkString(" "),
        "en")
    }
    val dir = docsDir(docs)
    val got = queries.SourceQueries.s14.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        ((r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"),
          r.getAs[String]("chunk_text")))).toMap
    val expect = docs.flatMap { case (id, text, _) =>
      val ws = text.split(" ", -1)
      (0 until ws.length by 48).flatMap { start =>
        val end = math.min(start + 64, ws.length)
        if (start == 0 || end - start >= 16)
          Some((id, (start / 48).toLong) ->
            ((start.toLong, end.toLong,
              ws.slice(start, end).mkString(" "))))
        else None
      }
    }.toMap
    assert(got === expect)
  }

  test("property: d15 ≡ brute-force containment over distinct gram " +
      "sets on random small corpora (seeded)") {
    val rnd = new scala.util.Random(77)
    // small vocab forces real overlap; 15 docs keeps brute force
    // exact — plus three crafted rows guaranteeing the rule fires:
    // an exact copy, a strict superset, and a half-overlap reject
    val base = (1L to 15L).map { id =>
      val n = 3 + rnd.nextInt(20)
      (id, (0 until n).map(_ => s"g${rnd.nextInt(8)}").mkString(" "),
        "en")
    }
    val docs = base ++ Seq(
      (21L, base.head._2, "en"),
      (22L, base.head._2 + " z1 z2 z3 z4 z5", "en"),
      (23L, "z9 z8 z7 z6 " + base.head._2, "en"))
    val dir = docsDir(docs)
    def grams(text: String): Set[Seq[String]] = {
      val ws = text.split(" ", -1).toSeq
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(_.toSeq).toSet
    }
    val g = docs.map { case (id, t, _) => id -> grams(t) }.toMap
    // the tiny 8-word vocab makes every gram a hub under the auto
    // df-cap ONLY if df exceeds it — with 15 docs max df = 15 < 64
    // (MinDfCap), so no gram is dropped and brute force is exact
    val expect = (for {
      a <- docs.map(_._1); b <- docs.map(_._1)
      if a < b && g(a).nonEmpty && g(b).nonEmpty
      inter = (g(a) intersect g(b)).size
      nMin = math.min(g(a).size, g(b).size)
      if inter.toDouble / nMin >= 0.8
    } yield {
      val (cd, ct) = if (g(a).size <= g(b).size) (a, b) else (b, a)
      (cd, ct) -> ((inter.toLong, nMin.toLong))
    }).toMap
    val got = queries.TextDedup.d15.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("contained_doc"),
        r.getAs[Long]("container_doc")) ->
        ((r.getAs[Long]("inter"), r.getAs[Long]("n_contained")))).toMap
    assert(got === expect)
    assert(expect.nonEmpty) // the corpus actually exercises the rule
  }

  test("property: v16 ≡ brute-force in-cell top-k on random vectors " +
      "(seeded)") {
    val rnd = new scala.util.Random(13)
    val vecs = (1L to 60L).map { id =>
      (id, Array.fill(12)((rnd.nextDouble() * 2 - 1).toFloat),
        rnd.nextInt(2))
    }
    val dir = embDir(vecs)
    val got = queries.VectorSearch.v16.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rnk")) ->
        r.getAs[Long]("neighbor_id")).toMap
    // reference: same scaled-integer arithmetic, plain Scala
    def sx(a: Array[Float]): Array[Long] =
      a.map(x => math.round(x.toDouble * 1e6))
    def cell(s: Array[Long]): Int =
      (0 until 8).map(i => if (s(i) > 0) 1 << i else 0).sum
    val rows = vecs.map { case (id, a, l) =>
      val s = sx(a); (id, l, cell(s), s,
        s.map(x => x * x).sum)
    }
    val expect = rows.flatMap { case (id, l, c, s, n) =>
      val mates = rows.filter(r =>
        r._2 == l && r._3 == c && r._1 != id)
      val ranked = mates.map { m =>
        val dot = s.zip(m._4).map { case (x, y) => x * y }.sum
        (m._1, dot.toDouble /
          (math.sqrt(n.toDouble) * math.sqrt(m._5.toDouble)))
      }.sortBy { case (nid, cos) => (-cos, nid) }.take(3)
      ranked.zipWithIndex.map { case ((nid, _), i) =>
        (id, (i + 1).toLong) -> nid
      }
    }.toMap
    assert(got === expect)
    assert(expect.nonEmpty)
  }

  test("property: d17 ≡ plain Scala incremental-dedup fold on random " +
      "docs (seeded)") {
    val rnd = new scala.util.Random(31)
    val pool = (1 to 12).map(i => s"content variant $i of the corpus")
    val docs = (1L to 80L).map(id =>
      (id, pool(rnd.nextInt(pool.size)), "en")) ++ Seq(
      (109L, "batch only duplicate text", "en"), // unique (first)
      (119L, "batch only duplicate text", "en"), // dup_batch of 109
      (129L, "never seen anywhere else", "en")) // unique
    val dir = docsDir(docs)
    val got = queries.TextDedup.d17.run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), r.getAs[Long]("canonical_id"))))
      .toMap
    val existing = docs.filter(_._1 % 10 != 9)
    val incoming = docs.filter(_._1 % 10 == 9)
    val exMin = existing.groupBy(_._2).view
      .mapValues(_.map(_._1).min).toMap
    val bMin = incoming.groupBy(_._2).view
      .mapValues(_.map(_._1).min).toMap
    val expect = incoming.map { case (id, text, _) =>
      id -> (exMin.get(text) match {
        case Some(e) => ("dup_existing", e)
        case None if bMin(text) < id => ("dup_batch", bMin(text))
        case None => ("unique", id)
      })
    }.toMap
    assert(got === expect)
    assert(expect.values.map(_._1).toSet.size === 3) // all 3 statuses hit
  }

  test("e20: trailing 3-day RANGE frame — interval membership by " +
      "event time, tied timestamps are peers") {
    import spark.implicits._
    val day = 86400000L
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val rows = Seq(
      (1L, 10L, t(0L), 1.0),
      (2L, 10L, t(day), 2.0),
      (3L, 10L, t(2 * day), 4.0),
      (4L, 10L, t(3 * day), 8.0), // 0 still in: ms >= 3d - 3d
      (5L, 10L, t(3 * day + 1), 16.0), // ms=0 ages out
      (6L, 20L, t(1000L), 3.0), // tied pair, second user
      (7L, 20L, t(1000L), 5.0))
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    rows.toDF("event_id", "user_id", "ts", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = queries.EventAnalytics.e20.run(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("n_window"), r.getAs[Double]("sum_value"))))
      .toMap
    assert(out(4L) === ((4L, 15.0)))
    assert(out(5L) === ((4L, 30.0))) // 2+4+8+16
    assert(out(6L) === ((2L, 8.0))) // RANGE peers enter together
    assert(out(7L) === ((2L, 8.0)))
  }

  test("property: e18 ≡ plain Scala transition counter on random " +
      "event streams (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val types = Vector("a", "b", "c")
    val rows = (1 to 300).map { i =>
      (rnd.nextInt(12).toLong, i.toLong, types(rnd.nextInt(types.size)))
    }
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    rows.toDF("user_id", "event_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = queries.EventAnalytics.e18.run(spark, dir).collect()
      .map(r => (r.getAs[String]("prev_type"),
        r.getAs[String]("next_type")) ->
        (r.getAs[Long]("n_ab"), r.getAs[Long]("n_from"),
          r.getAs[Long]("n_to"), r.getAs[Double]("lift"))).toMap
    val trans = rows.groupBy(_._1).values.flatMap { evs =>
      evs.sortBy(_._2).map(_._3).sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1)))
    }.toSeq
    val nAb = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = trans.size.toLong
    nAb.foreach { case ((a, b), c) =>
      val nFrom = trans.count(_._1 == a).toLong
      val nTo = trans.count(_._2 == b).toLong
      val (gAb, gFrom, gTo, gLift) = got((a, b))
      assert(gAb === c && gFrom === nFrom && gTo === nTo, s"($a,$b)")
      // same pinned op order as the query: divide before multiplying
      assert(gLift === (c.toDouble / nFrom) * (n.toDouble / nTo))
    }
    assert(got.size === nAb.size)
  }

  test("v05: max element saturates to ±127, zeros stay zero, " +
      "zero vectors are out of scope, mse bounded by step size") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    Seq(
      (1L, Array(1.0f, -0.5f, 0.0f, 0.25f), 0),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f), 1) // all-zero: filtered
    ).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = queries.VectorSearch.v05.run(spark, dir).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSet === Set(1L))
    val r = out.head
    assert(r.getAs[Long]("scale") === 1000000L)
    assert(r.getAs[Long]("n_sat") === 1L) // only the 1.0 element
    assert(r.getAs[Long]("n_zero") === 1L) // only the true zero
    // per-element error ≤ half a quantization step = scale/254;
    // mse (over the v05 64-dim contract denominator) must sit under
    // dims_used·(step/2)²/(64·1e12)
    val step = 1000000.0 / 127.0
    assert(r.getAs[Double]("mse") <= 4 * (step / 2) * (step / 2) / (64 * 1e12))
  }

  test("d10: non-canonical cluster members are removed per source, " +
      "canonical + unique docs survive with their chars") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    // 1,2,3 identical (one cluster, canonical = 1); 4 unique
    Seq(
      (1L, dup, "en", "s1", dup.length.toLong),
      (2L, dup, "en", "s1", dup.length.toLong),
      (3L, dup, "en", "s2", dup.length.toLong),
      (4L, "completely different text body here words", "en", "s2", 42L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.TextDedup.d10.run(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("s1").getAs[Long]("n_docs") === 2L)
    assert(out("s1").getAs[Long]("n_removed") === 1L) // doc 2
    assert(out("s1").getAs[Long]("n_kept") === 1L)    // doc 1 canonical
    assert(out("s1").getAs[Long]("chars_kept") === dup.length.toLong)
    assert(out("s2").getAs[Long]("n_docs") === 2L)
    assert(out("s2").getAs[Long]("n_removed") === 1L) // doc 3
    assert(out("s2").getAs[Long]("n_kept") === 1L)    // doc 4 unique
    assert(out("s2").getAs[Long]("chars_kept") === 42L)
  }

  test("t11: email/phone fire exactly on the synthesized keys and " +
      "masking replaces each match with its typed placeholder") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    Seq(
      (1L, "Customer#000000001", "BUILDING"),   // no email, no phone
      (2L, "Customer#000000002", "MACHINERY"),  // phone only
      (3L, "Customer#000000003", "HOUSEHOLD"),  // email only
      (6L, "Customer#000000006", "AUTOMOBILE")) // both
      .toDF("c_custkey", "c_name", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val out = queries.TextAnalysis.t11.run(spark, dir).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") === 0L)
    assert(out(1L).getAs[Long]("n_phones") === 0L)
    assert(out(1L).getAs[String]("masked") ===
      "customer Customer#000000001 segment BUILDING")
    assert(out(2L).getAs[Long]("n_phones") === 1L)
    // 10+2%90=12, 2*7%1000=014, 2*13%1000=026, 2*31%10000=0062
    assert(out(2L).getAs[String]("masked") ===
      "customer Customer#000000002 phone <PHONE> segment MACHINERY")
    assert(out(3L).getAs[Long]("n_emails") === 1L)
    assert(out(3L).getAs[String]("masked") ===
      "customer Customer#000000003 email <EMAIL> segment HOUSEHOLD")
    assert(out(6L).getAs[Long]("n_emails") === 1L &&
      out(6L).getAs[Long]("n_phones") === 1L)
    assert(out(6L).getAs[String]("masked") ===
      "customer Customer#000000006 email <EMAIL> phone <PHONE> " +
        "segment AUTOMOBILE")
  }

  test("d11: a span shared across docs counts as duplicated in BOTH, " +
      "within-source-unique spans don't, sub-8-token docs have zero " +
      "spans, heavy = dup fraction >= 1/2") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    val span = "one two three four five six seven eight" // 8 tokens
    Seq(
      (1L, span, "en", "s1"),                 // 1 span, dup with doc 2
      (2L, s"zero $span", "en", "s1"),        // 2 spans, 1 dup
      (3L, "a b c d e f g h i j", "en", "s2"), // 3 spans, all unique
      (4L, "too short here", "en", "s2"))      // < 8 tokens -> 0 spans
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.TextDedup.d11.run(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("s1").getAs[Long]("n_docs") === 2L)
    assert(out("s1").getAs[Long]("spans_total") === 3L)
    assert(out("s1").getAs[Long]("dup_spans_total") === 2L)
    assert(out("s1").getAs[Double]("dup_span_ratio") === 2.0 / 3.0)
    // doc 1: 1/1 dup; doc 2: 1/2 dup — both at or above the bar
    assert(out("s1").getAs[Long]("n_heavy_docs") === 2L)
    assert(out("s2").getAs[Long]("n_docs") === 2L)
    assert(out("s2").getAs[Long]("spans_total") === 3L)
    assert(out("s2").getAs[Long]("dup_spans_total") === 0L)
    assert(out("s2").getAs[Double]("dup_span_ratio") === 0.0)
    assert(out("s2").getAs[Long]("n_heavy_docs") === 0L)
  }

  test("d11: a span repeated only WITHIN one doc is not cross-doc " +
      "duplicated (df counts distinct docs, not instances)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    val span = "one two three four five six seven eight"
    // doc 1 contains the 8-token span twice (17 tokens, 10 spans; the
    // two exact-span instances hash equal but df = 1 doc)
    Seq((1L, s"$span x $span", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val r = queries.TextDedup.d11.run(spark, dir).collect().head
    assert(r.getAs[Long]("spans_total") === 10L)
    assert(r.getAs[Long]("dup_spans_total") === 0L)
    assert(r.getAs[Long]("n_heavy_docs") === 0L)
  }

  test("v09: ADC distance is code-word distance — same-code neighbors " +
      "tie at the query's distance to their centroid, cross-code " +
      "neighbors rank by codebook geometry") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    // 16-dim -> 2 subspaces. Label-0: e0/e8 (4 copies incl. the
    // query vec 0); label-1: e1/e9 (4 copies). Codebook entries are
    // exactly the cluster points, so ADC(q=c0, code 0-0) = 0 and
    // ADC(q=c0, code 1-1) = (1+1)e12 per subspace = 4e12 total.
    def vec(a: Int, b: Int): Array[Float] = {
      val v = Array.fill(16)(0.0f); v(a) = 1.0f; v(b) = 1.0f; v
    }
    val rows = (0 until 4).map(i => (i.toLong, vec(0, 8), 0)) ++
      (10 until 14).map(i => (i.toLong, vec(1, 9), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = queries.VectorSearch.v09.run(spark, dir).collect()
      .sortBy(_.getAs[Int]("rnk"))
    // only vec 0 matches the query spine (vec_id % 50 == 0)
    assert(out.forall(_.getAs[Long]("q_id") === 0L))
    assert(out.length === 5)
    // zero-distance same-code neighbors first, id-ordered
    assert(out.take(3).map(_.getAs[Long]("neighbor_id")).toSeq ===
      Seq(1L, 2L, 3L))
    assert(out.take(3).forall(_.getAs[Long]("adc_scaled") === 0L))
    // then the nearest cross-code neighbors at exactly 4e12
    assert(out.drop(3).map(_.getAs[Long]("neighbor_id")).toSeq ===
      Seq(10L, 11L))
    assert(out.drop(3).forall(_.getAs[Long]("adc_scaled") ===
      4000000000000L))
    assert(out(3).getAs[Double]("adc_dist") === 4.0)
  }

  test("d12: wide simhash finds a one-token-mutated copy at small " +
      "hamming; unrelated docs never pair at <= 3 of 60 bits") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    // 100 tokens, one swapped: 3 of 98 shingles change, so the 60-bit
    // signature moves by only the bits whose shingle-sum sat near zero
    // (deterministic md5 hashes — the observed hamming is fixed)
    val base = (1 to 100).map(i => s"tok$i").mkString(" ")
    val mutated = base.replace("tok50 ", "zzz ")
    // unrelated doc with a disjoint vocabulary: expected hamming ~30
    // of 60 — far beyond the threshold
    val other = (1 to 100).map(i => s"unrel$i").mkString(" ")
    Seq((1L, base, "en", "a"), (2L, mutated, "en", "a"),
      (3L, other, "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.TextDedup.d12.run(spark, dir).collect()
    assert(out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSeq === Seq((1L, 2L)))
    val h = out.head.getAs[Int]("hamming")
    assert(h >= 0 && h <= 3, s"mutated-copy hamming $h out of range")
    // same fixture through d04: the 32-bit tier must also pair 1-2
    // (d12 is d04 at different width constants, not a new operator)
    val out04 = queries.TextDedup.d04.run(spark, dir).collect()
    assert(out04.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq ===
      Seq((1L, 2L)))
  }

  test("d13: wide orthant bands pair exact duplicates but drop a " +
      "moderate-cosine pair that d06's 4-bit bands still catch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    val a = Array.fill(16)(1.0f)
    // c flips dim 6 (inside d13 band 1 = dims 1-8, and inside d06
    // band 2 = dims 5-8) and dim 12 (inside d13 band 2 = dims 9-16):
    // d06 band 1 (dims 1-4) still matches, so d06 keeps the pair;
    // BOTH d13 bands differ, so d13 never forms the candidate.
    // cos(a, c) = 12/16 = 0.75 — well above the 0.3 verify threshold.
    val c = a.clone(); c(5) = -1.0f; c(11) = -1.0f
    Seq((1L, a, 0), (2L, a.clone(), 0), (3L, c, 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    def pairs(q: Q) = q.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(pairs(queries.TextDedup.d06) ===
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs(queries.TextDedup.d13) === Set((1L, 2L)))
  }

  test("v10: IVF-PQ probes nprobe=2 nearest cells only — a farther " +
      "third cell's vectors never enter the candidate set, and probed " +
      "candidates score by ADC") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    // 16-dim -> 2 subspaces, 3 cells. Query vec 0 sits exactly on
    // cell 0's centroid; cell 1 is at coarse distance 4e12 (1+1 per
    // subspace), cell 2 at 1e13 (1+4 per subspace) — so nprobe=2
    // probes cells {0, 1} and every cell-2 vector is pruned before
    // scoring, whatever its ADC distance would have been.
    def vec(a: Int, b: Int, s: Float): Array[Float] = {
      val v = Array.fill(16)(0.0f); v(a) = s; v(b) = s; v
    }
    val rows = (0 until 3).map(i => (i.toLong, vec(0, 8, 1.0f), 0)) ++
      (10 until 13).map(i => (i.toLong, vec(1, 9, 1.0f), 1)) ++
      (20 until 23).map(i => (i.toLong, vec(2, 10, 2.0f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = queries.VectorSearch.v10.run(spark, dir).collect()
      .sortBy(_.getAs[Int]("rnk"))
    // only vec 0 matches the query spine (vec_id % 50 == 0)
    assert(out.forall(_.getAs[Long]("q_id") === 0L))
    assert(out.length === 5)
    // cell-0 neighbors at ADC 0 first (id tie-break), then cell-1 at
    // exactly 4e12; no cell-2 id (>= 20) anywhere
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq ===
      Seq(1L, 2L, 10L, 11L, 12L))
    assert(out.take(2).forall(r => r.getAs[Long]("adc_scaled") === 0L
      && r.getAs[Int]("cell") === 0))
    assert(out.drop(2).forall(r =>
      r.getAs[Long]("adc_scaled") === 4000000000000L
        && r.getAs[Int]("cell") === 1))
    assert(out(2).getAs[Double]("adc_dist") === 4.0)
  }
  test("property: v19 two-level top-k ≡ brute-force triplet miner on " +
      "random vectors with engineered cosine ties (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(123)
    val dir = Files.createTempDirectory("pq").toFile.getAbsolutePath
    // 120 vectors, 3 labels; ids 0/50/100 hit the %50 spine. Exact
    // duplicates force cosine TIES, so the neighbor_id tiebreak (both
    // in the shard window and the global window) is load-bearing.
    val base = (0 until 120).map { i =>
      val v = Array.fill(4)(rnd.nextFloat() - 0.5f)
      (i.toLong, v, i % 3)
    }
    val dup = base.filter(r => r._1 % 7 == 3)
      .map { case (id, v, l) => (200L + id, v.clone(), (l + 1) % 3) }
    val all = base ++ dup
    all.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    // plain-Scala reference: same HALF_UP 1e6 scaling, same formula
    def sx(v: Array[Float]): Array[Long] = v.map(x =>
      BigDecimal(x.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    val scaled = all.map { case (id, v, l) =>
      val s = sx(v); (id, l, s, s.map(x => x * x).sum)
    }
    def cos(a: (Long, Int, Array[Long], Long),
        b: (Long, Int, Array[Long], Long)): Double = {
      val dot = a._3.zip(b._3).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a._4.toDouble) * math.sqrt(b._4.toDouble))
    }
    val queries20 = scaled.filter(_._1 % 50 == 0).sortBy(_._1).take(20)
    val expect = queries20.flatMap { q =>
      val negs = scaled.filter(e => e._2 != q._2)
        .map(e => (e._1, e._2, cos(q, e)))
        .sortBy { case (id, _, c) => (-c, id) }.take(5)
      val posBest = scaled
        .filter(e => e._2 == q._2 && e._1 != q._1)
        .map(e => cos(q, e)).max
      negs.zipWithIndex.map { case ((nid, nl, c), i) =>
        (q._1, nid) -> ((q._2, nl, i + 1, c, posBest, posBest - c))
      }
    }.toMap
    val got = queries.VectorSearch.v19.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")) ->
        ((r.getAs[Int]("q_label"), r.getAs[Int]("neighbor_label"),
          r.getAs[Int]("rnk"), r.getAs[Double]("cosine"),
          r.getAs[Double]("pos_best"), r.getAs[Double]("margin")))).toMap
    assert(got === expect)
  }

  test("v19 emits rows for EVERY spine query at every SF — the inner " +
      "join on pos would silently drop a singleton-label spine query " +
      "(ADVICE r8: the oracle shares the join, so the hash gate " +
      "cannot catch that drop)") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").foreach { dir =>
      val spine = Tables.load(spark, dir, "embeddings")
        .filter(size(col("embedding")) > 0 && col("vec_id") % 50 === 0)
        .count().min(queries.VectorSearch.V01Queries.toLong)
      val emitted = queries.VectorSearch.v19.run(spark, dir)
        .select("q_id").distinct().count()
      assert(emitted === spine,
        s"$dir: v19 emitted $emitted distinct spine queries, corpus " +
          s"has $spine — a spine query was dropped (singleton label " +
          "class or empty negative set)")
    }
  }
}
