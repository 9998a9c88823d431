package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.sql.Date

import scala.collection.mutable
import scala.util.Random

import graft.plans.SqlGate

/** Differential SQL fuzz gate (VERDICT r9 ask #1, widened r10/r11):
  * hundreds of seeded random SELECTs from [[SqlFuzz]]'s grammar, each
  * executed through the REAL parsed-plan gate ([[SqlGate.query]]) on
  * Spark and replayed by DuckDB over the same parquet fixtures
  * (scripts/sql_fuzz_oracle.py, check_oracle.py normalization).
  * 100% agreement required — any divergence the fuzzer finds prints
  * its SQL and seed, ready to lock as a regression query.
  *
  * Two corpora per suite run (VERDICT r10 ask #3):
  *  - the synthetic adversarial views (NULL-dense, non-ASCII,
  *    engineered key overlaps) — the failure-surface probe;
  *  - the driver's REAL sf0.01 parquet (lineitem/orders/customer/
  *    events/nation: real dates, doubles, FK join keys, 60k-row
  *    cardinalities) — dialect coverage on real data shapes.
  *
  * Deterministic by default (fixed seed, so CI is stable); explore
  * new corpus space with GRAFT_FUZZ_SEED / GRAFT_FUZZ_N, or set
  * GRAFT_FUZZ_ROTATE=1 (scripts/gate.sh does) to ALSO run a
  * date-derived rotating seed — printed with every run, so a
  * rotating-seed failure is reproducible verbatim.
  */
class SqlFuzzSpec extends SparkTestBase {

  private val DefaultSeed = 20260816L
  private val DefaultN = 500

  /** Seeded fixtures with the failure surface the grammar probes:
    * NULLs in every column kind, duplicate group keys, negative
    * ints, empty strings, non-ASCII (equality/LIKE-only column),
    * overlapping join keys, UNIQUE ids (the LIMIT total-order
    * anchor — [[SqlFuzz]] relies on it). */
  private def writeFixtures(dir: Path): Unit = {
    import spark.implicits._
    val r = new Random(7)
    def opt[A](p: Double)(v: => A): Option[A] =
      if (r.nextDouble() < p) None else Some(v)
    val names = Vector("alpha", "Beta", "gamma", "", "delta9", "Bar",
      "foo", "mellow", "zed", "aardvark")
    val notes = Vector("Ünïcødé", "naïve", "", "plain", "Note-1")
    val t1 = (0 until 300).map { i =>
      (i.toLong,
        opt(0.08)(('a' + r.nextInt(5)).toChar.toString).orNull,
        opt(0.07)(java.lang.Long.valueOf(r.nextInt(1000) - 50L)).orNull,
        opt(0.10)(java.lang.Double.valueOf(
          r.nextInt(10000) / 100.0)).orNull,
        opt(0.06)(new Date(Date.valueOf("2023-01-01").getTime +
          r.nextInt(400) * 86400000L)).orNull,
        opt(0.08)(names(r.nextInt(names.size))).orNull)
    }.toDF("id", "grp", "val", "score", "d", "name")
    val t2 = (0 until 220).map { i =>
      (150L + i, // unique, half-overlapping t1's ids
        opt(0.10)(Vector("x", "y", "z")(r.nextInt(3))).orNull,
        opt(0.08)(java.lang.Long.valueOf(r.nextInt(5000).toLong)).orNull,
        opt(0.10)(notes(r.nextInt(notes.size))).orNull)
    }.toDF("id", "cat", "amt", "note")
    val t3 = Seq(("x", "L-x", 3L), ("y", "L-y", 7L), ("z", "L-z", 1L),
      ("w", "L-w", 9L)).toDF("cat", "label", "boost")
    t1.coalesce(1).write.parquet(s"$dir/t1")
    t2.coalesce(1).write.parquet(s"$dir/t2")
    t3.coalesce(1).write.parquet(s"$dir/t3")
  }

  private def scriptPath: String = {
    val cand = Seq("scripts/sql_fuzz_oracle.py",
      "../scripts/sql_fuzz_oracle.py",
      "/root/repo/scripts/sql_fuzz_oracle.py")
      .map(new java.io.File(_)).find(_.exists)
    assert(cand.isDefined, "sql_fuzz_oracle.py not found from cwd")
    cand.get.getAbsolutePath
  }

  /** One full differential run: generate the corpus, execute every
    * query through the real gate, replay in DuckDB, demand 100%
    * agreement. Returns the corpus for grammar-coverage asserts. */
  private def runFuzz(cfg: SqlFuzz.Config, fixtureDir: String,
      tables: Seq[String], seed: Long, n: Int, tag: String)
      : Seq[(String, String)] = {
    val work = Files.createTempDirectory(s"sqlfuzz-$tag")
    val corpus = SqlFuzz.corpus(cfg, seed, n)
    val outDir = work.resolve("out")
    val sparkFailures = mutable.Buffer.empty[String]
    corpus.foreach { case (qid, sql) =>
      try {
        SqlGate.query(spark, sql) // the REAL gate: parsed-plan check
          .coalesce(1).write.parquet(s"$outDir/$qid")
      } catch {
        case e: Exception =>
          sparkFailures += s"$qid: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(300)}\n  SQL: $sql"
      }
    }
    assert(sparkFailures.isEmpty,
      s"[$tag seed=$seed] ${sparkFailures.size}/$n generated queries " +
        "failed on Spark (generator must emit only valid SQL):\n" +
        sparkFailures.take(5).mkString("\n"))
    val qJson = work.resolve("queries.json")
    Files.write(qJson, corpus.map { case (qid, sql) =>
      Sessions.jsonEscape(qid) + ":" + Sessions.jsonEscape(sql)
    }.mkString("{", ",", "}").getBytes(UTF_8))
    // DuckDB replay + compare (check_oracle normalization)
    val pb = new ProcessBuilder("python3", scriptPath,
      fixtureDir, qJson.toString, outDir.toString, tables.mkString(","))
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), UTF_8)
    val rc = proc.waitFor()
    val failLines = out.linesIterator.filter(_.startsWith("FAIL")).toSeq
    assert(rc == 0 && failLines.isEmpty,
      s"[$tag seed=$seed] differential fuzz found ${failLines.size} " +
        "divergence(s) — each SQL below is a ready-made regression " +
        "query:\n" + failLines.take(10).mkString("\n") +
        "\n--- tail ---\n" +
        out.linesIterator.toSeq.takeRight(3).mkString("\n"))
    // the compare actually compared: the summary must count ALL n
    // (an empty queries.json would exit 0 with "0 pass")
    val summary = "(\\d+) pass, (\\d+) fail".r.findFirstMatchIn(out)
    assert(summary.exists(_.group(1).toInt == n),
      s"[$tag seed=$seed] oracle summary did not cover all $n " +
        "queries: " +
        out.linesIterator.toSeq.takeRight(3).mkString(" | "))
    println(s"SQL_FUZZ[$tag]: $n queries, seed=$seed, 100% agreement (" +
      summary.map(_.matched).getOrElse("") + ")")
    corpus
  }

  /** Rotating seed: a new corpus each calendar day, stable within a
    * day so a red CI run reproduces with the printed seed. */
  private def rotatingSeed: Long =
    java.time.LocalDate.now(java.time.ZoneOffset.UTC).toEpochDay

  private def grammarCoverage(sqls: Seq[String]): Unit = {
    assert(sqls.exists(_.contains("GROUP BY")))
    assert(sqls.exists(_.contains("LEFT JOIN")))
    assert(sqls.exists(s => s.contains("INTERSECT") ||
      s.contains("EXCEPT")))
    assert(sqls.exists(_.contains("EXISTS")))
    assert(sqls.exists(_.contains("LIMIT")))
    assert(sqls.exists(_.contains(") OVER (")))
    assert(sqls.exists(_.startsWith("WITH ")))
    assert(sqls.exists(s => s.contains("ROLLUP") || s.contains("CUBE")))
    assert(sqls.exists(_.contains("GROUPING SETS")))
    assert(sqls.exists(_.contains("ROW_NUMBER()")))
  }

  test("differential SQL fuzz: 500 seeded SELECTs through the real " +
      "gate agree with DuckDB on the synthetic adversarial fixtures " +
      "(VERDICT r9 ask #1; seed/N via GRAFT_FUZZ_SEED/GRAFT_FUZZ_N)") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong)
      .getOrElse(DefaultSeed)
    val n = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(DefaultN)
    val dir = Files.createTempDirectory("sqlfuzz")
    writeFixtures(dir)
    // both engines read the SAME parquet — Spark registers views over
    // the written files, not the in-memory frames
    Seq("t1", "t2", "t3").foreach { t =>
      spark.read.parquet(s"$dir/$t").createOrReplaceTempView(t)
    }
    val corpus = runFuzz(SqlFuzz.Synthetic, dir.toString,
      Seq("t1", "t2", "t3"), seed, n, "synthetic")
    // the corpus actually exercised the grammar: every family present
    grammarCoverage(corpus.map(_._2))
    if (sys.env.contains("GRAFT_FUZZ_ROTATE"))
      runFuzz(SqlFuzz.Synthetic, dir.toString,
        Seq("t1", "t2", "t3"), rotatingSeed, n, "synthetic-rotating")
  }

  test("differential SQL fuzz over the REAL sf0.01 parquet: 500 " +
      "seeded SELECTs over lineitem/orders/customer/events/nation " +
      "agree with DuckDB (VERDICT r10 ask #3 — real dates, doubles, " +
      "FK join keys, 60k-row cardinalities)") {
    val sfDir = sys.env.getOrElse("GRAFT_FUZZ_SF_DIR",
      "/root/testdata/sf0.01")
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong)
      .getOrElse(DefaultSeed)
    val n = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(DefaultN)
    val tables = Seq("lineitem", "orders", "customer", "events",
      "nation")
    // plain views over the raw parquet files — BOTH engines read the
    // same bytes (no Tables.load normalization: events.ts stays out
    // of the fuzz schema for exactly that reason, see SqlFuzz.Tpch)
    tables.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    val corpus = runFuzz(SqlFuzz.Tpch, sfDir, tables, seed, n, "sf")
    grammarCoverage(corpus.map(_._2))
    if (sys.env.contains("GRAFT_FUZZ_ROTATE"))
      runFuzz(SqlFuzz.Tpch, sfDir, tables, rotatingSeed, n,
        "sf-rotating")
  }

  test("empty-input ROLLUP divergence (found by the round-10 fuzz " +
      "run): Spark emits ZERO rows where the standard emits one " +
      "grand-total row for the () set; HAVING COUNT(*) > 0 is the " +
      "documented neutralizer the generator applies") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("v", "k")
      .createOrReplaceTempView("rt")
    // Spark: empty input -> no rows at all from ROLLUP (DuckDB would
    // return one row (NULL, 1, 0) for the grand-total set here)
    val empty = SqlGate.query(spark,
      "SELECT k, GROUPING(k) AS gf, COUNT(*) AS c FROM rt " +
        "WHERE v > 99 GROUP BY ROLLUP(k)").collect()
    assert(empty.isEmpty,
      "Spark's empty-input ROLLUP behavior changed — revisit the " +
        "generator's HAVING COUNT(*) > 0 exclusion and its scaladoc")
    // the neutralizer is a no-op on non-empty input: all 3 grouping
    // rows survive (2 groups + grand total)
    val kept = SqlGate.query(spark,
      "SELECT k, GROUPING(k) AS gf, COUNT(*) AS c FROM rt " +
        "GROUP BY ROLLUP(k) HAVING COUNT(*) > 0").collect()
    assert(kept.length == 3)
  }

  test("the fuzz gate rejects non-SELECT statements the same way the " +
      "handwritten adversarial corpus does (gate still guards the " +
      "fuzz path)") {
    intercept[SqlGate.BlockedSqlException] {
      SqlGate.query(spark, "DROP TABLE t1")
    }
    intercept[SqlGate.BlockedSqlException] {
      SqlGate.query(spark,
        "INSERT OVERWRITE DIRECTORY '/tmp/x' SELECT 1")
    }
  }
}
