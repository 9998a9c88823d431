package graft

import scala.util.Random

/** Seeded random SELECT generator for the differential SQL fuzz gate
  * (VERDICT r9 ask #1): the gated SQL surface (graft.plans.SqlGate —
  * the reference's #1 entry point, `csv_tool.py:273-386`) is
  * verified by ~30 handwritten oracle queries; this generator covers
  * the supported grammar subset with hundreds of seeded queries per
  * run, each executed through the REAL gate on Spark and replayed by
  * DuckDB over the same parquet fixtures
  * (scripts/sql_fuzz_oracle.py, check_oracle.py normalization).
  *
  * Grammar: projections (arithmetic, CASE, string/date scalar
  * functions — the SURVEY §2.8 set), WHERE predicates (comparisons,
  * AND/OR/NOT, IN lists, BETWEEN, LIKE, IS NULL), GROUP BY/HAVING
  * with COUNT/COUNT DISTINCT/SUM/AVG/MIN/MAX, DISTINCT, ORDER
  * BY/LIMIT (total order only), INNER/LEFT equi-joins over 2–3
  * views, UNION [ALL]/INTERSECT/EXCEPT, scalar/IN/EXISTS subqueries
  * incl. correlated.
  *
  * DELIBERATE exclusIONS, each a documented cross-dialect trap, not a
  * Spark limitation (the gate passes them through fine):
  *  - `concat()` — NULL-ignoring in DuckDB, NULL-propagating in
  *    Spark; the generator emits `||` (NULL-propagating in both);
  *  - division and modulo — `/` is integer division in DuckDB and
  *    float division in Spark; `%` sign conventions agree but ride
  *    the same parser corner, both out;
  *  - ORDER BY without an explicit NULLS FIRST — Spark defaults
  *    NULLS FIRST ascending where DuckDB defaults NULLS LAST, so
  *    every generated sort key carries the explicit modifier and
  *    LIMIT appears only under a provably total order;
  *  - UPPER/LOWER and ordered comparisons on the non-ASCII column —
  *    collation/casing of non-ASCII is engine-locale territory;
  *  - SUBSTRING with start < 1 — 0/negative-index semantics differ;
  *  - ROLLUP/CUBE/GROUPING SETS over an EMPTY input — the standard
  *    (DuckDB, Postgres) emits one grand-total row for the ()
  *    grouping set where Spark's Expand-based implementation emits
  *    zero rows (found by this fuzzer, round 10); every generated
  *    rollup query carries `HAVING COUNT(*) > 0`, which removes
  *    exactly that row and nothing else, so the rest of the family
  *    still diff-tests. Spark's behavior is pinned by a regression
  *    test in SqlFuzzSpec.
  */
object SqlFuzz {

  // fixture schema: (alias base, columns with kind)
  //  kinds: i = bigint, s = ascii string, u = string incl. non-ascii
  //         (equality/LIKE/IS NULL only), d = date, f = double
  final case class Col(name: String, kind: Char)
  val T1: Seq[Col] = Seq(Col("id", 'i'), Col("grp", 's'),
    Col("val", 'i'), Col("score", 'f'), Col("d", 'd'), Col("name", 's'))
  val T2: Seq[Col] = Seq(Col("id", 'i'), Col("cat", 's'),
    Col("amt", 'i'), Col("note", 'u'))
  val T3: Seq[Col] = Seq(Col("cat", 's'), Col("label", 's'),
    Col("boost", 'i'))
  val Tables: Map[String, Seq[Col]] =
    Map("t1" -> T1, "t2" -> T2, "t3" -> T3)

  private val strLits = Vector("a", "b", "x", "foo", "Bar", "m", "z9")
  private val likeLits = Vector("a%", "%o%", "_a%", "%z", "%ar%", "f__")

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  /** Random columns of a kind set, qualified by alias. */
  private def colOf(r: Random, scope: Seq[(String, Seq[Col])],
      kinds: String): Option[String] = {
    val cands = for {
      (a, cols) <- scope
      c <- cols if kinds.contains(c.kind)
    } yield s"$a.${c.name}"
    if (cands.isEmpty) None else Some(pick(r, cands))
  }

  /** Integer-valued expression (BIGINT in both dialects). */
  private def intExpr(r: Random, scope: Seq[(String, Seq[Col])],
      depth: Int): String = {
    val leaf = colOf(r, scope, "i").getOrElse((r.nextInt(90)).toString)
    if (depth <= 0) leaf
    else r.nextInt(8) match {
      case 0 => leaf
      case 1 => (r.nextInt(151) - 50).toString
      case 2 => s"(${intExpr(r, scope, depth - 1)} + " +
        s"${intExpr(r, scope, depth - 1)})"
      case 3 => s"(${intExpr(r, scope, depth - 1)} - " +
        s"${intExpr(r, scope, depth - 1)})"
      case 4 => s"(${intExpr(r, scope, depth - 1)} * ${1 + r.nextInt(9)})"
      case 5 => s"LENGTH(${strExpr(r, scope, 0)})"
      case 6 => s"COALESCE(${colOf(r, scope, "i").getOrElse(leaf)}, " +
        s"${r.nextInt(20)})"
      case 7 => s"CASE WHEN ${pred(r, scope, depth - 1)} THEN " +
        s"${intExpr(r, scope, 0)} ELSE ${intExpr(r, scope, 0)} END"
    }
  }

  /** ASCII string expression. */
  private def strExpr(r: Random, scope: Seq[(String, Seq[Col])],
      depth: Int): String = {
    val leaf = colOf(r, scope, "s")
      .getOrElse(s"'${pick(r, strLits)}'")
    if (depth <= 0) leaf
    else r.nextInt(8) match {
      case 0 => leaf
      case 1 => s"'${pick(r, strLits)}'"
      case 2 => s"LOWER(${strExpr(r, scope, depth - 1)})"
      case 3 => s"UPPER(${strExpr(r, scope, depth - 1)})"
      case 4 => s"(${strExpr(r, scope, depth - 1)} || " +
        s"${strExpr(r, scope, 0)})"
      case 5 => s"SUBSTRING(${strExpr(r, scope, depth - 1)}, " +
        s"${1 + r.nextInt(3)}, ${1 + r.nextInt(4)})"
      case 6 => s"REPLACE(${strExpr(r, scope, depth - 1)}, " +
        s"'${pick(r, strLits)}', '${pick(r, strLits)}')"
      case 7 => s"COALESCE(NULLIF(${strExpr(r, scope, 0)}, " +
        s"'${pick(r, strLits)}'), '${pick(r, strLits)}')"
    }
  }

  /** Boolean predicate. */
  private def pred(r: Random, scope: Seq[(String, Seq[Col])],
      depth: Int): String = {
    def leaf: String = r.nextInt(9) match {
      case 0 => s"${intExpr(r, scope, 1)} ${pick(r,
        Seq("=", "<>", "<", "<=", ">", ">="))} ${intExpr(r, scope, 0)}"
      case 1 => s"${strExpr(r, scope, 0)} ${pick(r,
        Seq("=", "<>", "<", ">"))} '${pick(r, strLits)}'"
      case 2 => s"${colOf(r, scope, "isdfu").get} IS " +
        s"${if (r.nextBoolean()) "" else "NOT "}NULL"
      case 3 => s"${colOf(r, scope, "su").getOrElse("'a'")} LIKE " +
        s"'${pick(r, likeLits)}'"
      case 4 => s"${intExpr(r, scope, 0)} BETWEEN " +
        s"${r.nextInt(40) - 20} AND ${40 + r.nextInt(200)}"
      case 5 => s"${colOf(r, scope, "i").getOrElse("0")} IN (" +
        Seq.fill(2 + r.nextInt(3))(r.nextInt(300)).mkString(", ") + ")"
      case 6 => s"${colOf(r, scope, "s").getOrElse("'a'")} IN (" +
        Seq.fill(2 + r.nextInt(2))(s"'${pick(r, strLits)}'")
          .mkString(", ") + ")"
      case 7 => colOf(r, scope, "d") match {
        case Some(c) => s"$c ${pick(r, Seq(">=", "<", "="))} DATE " +
          f"'2023-${1 + r.nextInt(12)}%02d-${1 + r.nextInt(28)}%02d'"
        case None => s"${intExpr(r, scope, 0)} >= ${r.nextInt(50)}"
      }
      case 8 => colOf(r, scope, "f") match {
        case Some(c) => s"$c ${pick(r, Seq(">", "<="))} " +
          s"${r.nextInt(100)}.${r.nextInt(10)}"
        case None => s"${intExpr(r, scope, 0)} < ${r.nextInt(900)}"
      }
    }
    if (depth <= 0) leaf
    else r.nextInt(5) match {
      case 0 => s"(${pred(r, scope, depth - 1)} AND " +
        s"${pred(r, scope, depth - 1)})"
      case 1 => s"(${pred(r, scope, depth - 1)} OR " +
        s"${pred(r, scope, depth - 1)})"
      case 2 => s"(NOT ${pred(r, scope, depth - 1)})"
      case _ => leaf
    }
  }

  /** Aggregate expression over the scope. */
  private def aggExpr(r: Random, scope: Seq[(String, Seq[Col])]): String =
    r.nextInt(9) match {
      case 0 => "COUNT(*)"
      case 1 => s"COUNT(${colOf(r, scope, "isdfu").get})"
      case 2 => s"COUNT(DISTINCT ${colOf(r, scope, "is").get})"
      case 3 => s"SUM(${intExpr(r, scope, 1)})"
      case 4 => s"MIN(${intExpr(r, scope, 0)})"
      case 5 => s"MAX(${intExpr(r, scope, 0)})"
      case 6 => s"AVG(${intExpr(r, scope, 0)})"
      case 7 => colOf(r, scope, "f") match {
        case Some(c) => s"${pick(r, Seq("SUM", "AVG", "MIN", "MAX"))}($c)"
        case None => "COUNT(*)"
      }
      case 8 => colOf(r, scope, "sd") match {
        case Some(c) => s"${pick(r, Seq("MIN", "MAX"))}($c)"
        case None => "COUNT(*)"
      }
    }

  /** Scalar projection (non-aggregate). */
  private def scalarExpr(r: Random, scope: Seq[(String, Seq[Col])])
      : String =
    r.nextInt(7) match {
      case 0 | 1 => intExpr(r, scope, 1 + r.nextInt(2))
      case 2 | 3 => strExpr(r, scope, 1 + r.nextInt(2))
      case 4 => colOf(r, scope, "f").getOrElse(intExpr(r, scope, 1))
      case 5 => colOf(r, scope, "d") match {
        case Some(c) =>
          if (r.nextBoolean()) c
          else s"EXTRACT(${pick(r, Seq("YEAR", "MONTH"))} FROM $c)"
        case None => intExpr(r, scope, 1)
      }
      case 6 => colOf(r, scope, "u").getOrElse(strExpr(r, scope, 1))
    }

  /** One full query; kinds weighted toward the single-table surface
    * the reference's csv_sql sees most. Round-10 widening: window
    * functions, CTEs and ROLLUP/CUBE/GROUPING SETS join the grammar
    * (the gate passes any pure SELECT through, so the analytic
    * surface is reachable from csv_sql and must agree too). */
  def genQuery(r: Random): String = r.nextInt(26) match {
    case k if k < 7 => simple(r)
    case k if k < 12 => joinQuery(r, 2)
    case k if k < 14 => joinQuery(r, 3)
    case k if k < 16 => setOp(r)
    case k if k < 19 => subQuery(r)
    case k if k < 22 => windowQuery(r)
    case k if k < 24 => cteQuery(r)
    case _ => rollupQuery(r)
  }

  /** (FROM clause, scope, alias of a never-null-extended table with
    * a UNIQUE id — the LIMIT total-order anchor; None when only t3
    * is in scope). */
  private def fromScope(r: Random, nTables: Int)
      : (String, Seq[(String, Seq[Col])], Option[String]) = {
    // join graph: t1 a JOIN t2 b ON a.id = b.id [JOIN t3 c ON b.cat
    // = c.cat]; LEFT joins keep the null-extended side out of
    // further join keys
    if (nTables == 1) {
      val (t, alias) = pick(r, Seq(("t1", "a"), ("t2", "b"), ("t3", "c")))
      (s"$t $alias", Seq(alias -> Tables(t)),
        if (t == "t3") None else Some(alias))
    } else if (nTables == 2) {
      val kind = pick(r, Seq("JOIN", "LEFT JOIN"))
      (s"t1 a $kind t2 b ON a.id = b.id",
        Seq("a" -> T1, "b" -> T2), Some("a"))
    } else {
      val k1 = pick(r, Seq("JOIN", "LEFT JOIN"))
      if (k1 == "JOIN")
        // b.id unique within the join of t2 with the tiny t3 dim?
        // NOT guaranteed (a cat repeated in t3 fans b out) — anchor
        // on a.id only when t1 is inner and t3 keys are unique by
        // construction (they are: one row per cat) — still, keep
        // the conservative rule: only a never-fanned-out unique id
        // anchors a LIMIT, so the 3-way join never takes one
        (s"t1 a JOIN t2 b ON a.id = b.id JOIN t3 c ON b.cat = c.cat",
          Seq("a" -> T1, "b" -> T2, "c" -> T3), None)
      else // LEFT at the END so no null-extended key feeds a join
        (s"t2 b JOIN t3 c ON b.cat = c.cat LEFT JOIN t1 a " +
          "ON a.id = b.id", Seq("a" -> T1, "b" -> T2, "c" -> T3), None)
    }
  }

  private def simple(r: Random): String = {
    val (from, scope, idAlias) = fromScope(r, 1)
    body(r, from, scope, idAlias)
  }

  private def joinQuery(r: Random, n: Int): String = {
    val (from, scope, idAlias) = fromScope(r, n)
    body(r, from, scope, idAlias)
  }

  /** SELECT body over a resolved FROM: either grouped or plain. */
  private def body(r: Random, from: String,
      scope: Seq[(String, Seq[Col])], idAlias: Option[String]): String = {
    val where =
      if (r.nextInt(10) < 8) s" WHERE ${pred(r, scope, 1 + r.nextInt(2))}"
      else ""
    if (r.nextInt(10) < 4) {
      // grouped: keys are plain columns (present in both the SELECT
      // and GROUP BY verbatim — both dialects demand it)
      val nKeys = 1 + r.nextInt(2)
      val keys = Seq.fill(nKeys)(colOf(r, scope, "isd").get).distinct
      val nAggs = 1 + r.nextInt(3)
      val aggs = (0 until nAggs).map(i => s"${aggExpr(r, scope)} AS g$i")
      val proj = keys.zipWithIndex.map { case (k, i) => s"$k AS k$i" } ++
        aggs
      val having =
        if (r.nextInt(10) < 3) s" HAVING COUNT(*) >= ${1 + r.nextInt(3)}"
        else ""
      val tail =
        if (r.nextInt(10) < 4) {
          // group keys are unique per output row -> total order
          val dirs = keys.indices.map(i => s"k$i ${pick(r,
            Seq("ASC", "DESC"))} NULLS FIRST").mkString(", ")
          s" ORDER BY $dirs LIMIT ${3 + r.nextInt(20)}"
        } else ""
      s"SELECT ${proj.mkString(", ")} FROM $from$where " +
        s"GROUP BY ${keys.mkString(", ")}$having$tail"
    } else {
      val distinct =
        if (r.nextInt(10) < 2) "DISTINCT " else ""
      val nCols = 1 + r.nextInt(4)
      val proj = (0 until nCols)
        .map(i => s"${scalarExpr(r, scope)} AS c$i")
      // LIMIT only with a provably total order: the unique id of a
      // never-null-extended, never-fanned-out alias, projected — and
      // never under DISTINCT (keep the rule simple and safe)
      if (distinct.isEmpty && idAlias.isDefined && r.nextInt(10) < 4) {
        val ida = idAlias.get
        s"SELECT ${proj.mkString(", ")}, $ida.id AS cid FROM " +
          s"$from$where ORDER BY cid ASC NULLS FIRST " +
          s"LIMIT ${5 + r.nextInt(40)}"
      } else
        s"SELECT $distinct${proj.mkString(", ")} FROM $from$where"
    }
  }

  private def setOp(r: Random): String = {
    val op = pick(r, Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT"))
    def side(t: String, alias: String, sCol: String, iCol: String)
        : String = {
      val scope = Seq(alias -> Tables(t))
      val where =
        if (r.nextBoolean()) s" WHERE ${pred(r, scope, 1)}" else ""
      s"SELECT $alias.$sCol AS c0, $alias.$iCol AS c1 FROM $t " +
        s"$alias$where"
    }
    s"${side("t1", "a", "grp", "val")} $op ${side("t2", "b", "cat", "amt")}"
  }

  private def subQuery(r: Random): String = {
    val scope = Seq("a" -> T1)
    r.nextInt(3) match {
      case 0 => // correlated scalar subquery in the projection
        s"SELECT a.id AS c0, a.grp AS c1, (SELECT MAX(b.amt) FROM " +
          s"t2 b WHERE b.id = a.id) AS c2 FROM t1 a WHERE " +
          s"${pred(r, scope, 1)}"
      case 1 => // IN subquery
        val inner = s"SELECT b.id FROM t2 b WHERE " +
          s"${pred(r, Seq("b" -> T2), 1)}"
        s"SELECT a.id AS c0, ${scalarExpr(r, scope)} AS c1 FROM t1 a " +
          s"WHERE a.id IN ($inner)"
      case _ => // [NOT] EXISTS correlated
        val not = if (r.nextBoolean()) "NOT " else ""
        s"SELECT a.id AS c0, a.val AS c1 FROM t1 a WHERE $not" +
          s"EXISTS (SELECT 1 FROM t2 b WHERE b.id = a.id AND " +
          s"${pred(r, Seq("b" -> T2), 0)})"
    }
  }

  /** Window-function query (round-10 widening). Determinism rules:
    * ROW_NUMBER / frames / LAG order by the UNIQUE never-null id (the
    * same total-order anchor LIMIT uses), so row numbering and frame
    * contents are identical in both engines; RANK/DENSE_RANK may
    * order by a non-unique expression (ties collapse to the same
    * rank either way) but then carry the explicit NULLS FIRST both
    * dialects need to agree on; whole-partition aggregates take no
    * ORDER BY at all (the frame is the full partition — no peer-row
    * RANGE subtleties). */
  private def windowQuery(r: Random): String = {
    // only t1/t2 single-table or the 2-way inner join: every shape
    // below needs the unique id of a never-fanned-out alias
    val (from, scope, ida) = r.nextInt(3) match {
      case 0 => ("t1 a", Seq("a" -> T1), "a")
      case 1 => ("t2 b", Seq("b" -> T2), "b")
      case _ => ("t1 a JOIN t2 b ON a.id = b.id",
        Seq("a" -> T1, "b" -> T2), "a")
    }
    val part = colOf(r, scope, "s").get // nullable: NULL is its own
    // partition in both engines
    val wexprs = (0 until 1 + r.nextInt(3)).map { i =>
      val e = r.nextInt(6) match {
        case 0 => s"ROW_NUMBER() OVER (PARTITION BY $part " +
          s"ORDER BY $ida.id ASC NULLS FIRST)"
        case 1 => s"${pick(r, Seq("RANK", "DENSE_RANK"))}() OVER (" +
          s"PARTITION BY $part ORDER BY ${intExpr(r, scope, 1)} " +
          s"${pick(r, Seq("ASC", "DESC"))} NULLS FIRST)"
        case 2 => s"${pick(r, Seq("SUM", "MIN", "MAX", "COUNT"))}(" +
          s"${colOf(r, scope, "i").get}) OVER (PARTITION BY $part)"
        case 3 => s"SUM(${intExpr(r, scope, 0)}) OVER (PARTITION BY " +
          s"$part ORDER BY $ida.id ASC NULLS FIRST ROWS BETWEEN " +
          "UNBOUNDED PRECEDING AND CURRENT ROW)"
        case 4 => s"${pick(r, Seq("LAG", "LEAD"))}(" +
          s"${colOf(r, scope, "is").get}, ${1 + r.nextInt(2)}) OVER (" +
          s"PARTITION BY $part ORDER BY $ida.id ASC NULLS FIRST)"
        case 5 => s"COUNT(*) OVER (ORDER BY $ida.id ASC NULLS FIRST " +
          "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
      }
      s"$e AS w$i"
    }
    val where =
      if (r.nextInt(10) < 6) s" WHERE ${pred(r, scope, 1)}" else ""
    val tail = // id is unique + projected -> a total order for LIMIT
      if (r.nextInt(10) < 4)
        s" ORDER BY cid ASC NULLS FIRST LIMIT ${5 + r.nextInt(40)}"
      else ""
    s"SELECT $ida.id AS cid, $part AS c0, ${wexprs.mkString(", ")} " +
      s"FROM $from$where$tail"
  }

  /** CTE query (round-10 widening): a grouped WITH body consumed by
    * an outer SELECT — alone or joined back to the t3 dimension. The
    * outer scope types come from the CTE's own projection, so outer
    * predicates/arithmetic exercise the analyzer's CTE column
    * resolution in both dialects. */
  private def cteQuery(r: Random): String = {
    if (r.nextBoolean()) {
      // shape A: WITH w AS (group t1|t2) SELECT ... FROM w WHERE ...
      val (t, alias, key) = if (r.nextBoolean())
        ("t1", "a", pick(r, Seq("a.grp", "a.name")))
      else ("t2", "b", "b.cat")
      val scope = Seq(alias -> Tables(t))
      val where =
        if (r.nextBoolean()) s" WHERE ${pred(r, scope, 1)}" else ""
      val inner = s"SELECT $key AS k0, COUNT(*) AS cnt, " +
        s"SUM(${intExpr(r, scope, 1)}) AS s0, " +
        s"MAX(${colOf(r, scope, "i").get}) AS m0 FROM $t $alias" +
        s"$where GROUP BY $key"
      val wScope = Seq("w" -> Seq(Col("k0", 's'), Col("cnt", 'i'),
        Col("s0", 'i'), Col("m0", 'i')))
      val proj = (0 until 1 + r.nextInt(3))
        .map(i => s"${scalarExpr(r, wScope)} AS c$i")
      val ow =
        if (r.nextBoolean()) s" WHERE ${pred(r, wScope, 1)}" else ""
      s"WITH w AS ($inner) SELECT w.k0 AS ck, ${proj.mkString(", ")} " +
        s"FROM w$ow"
    } else {
      // shape B: the CTE joined back to the t3 dimension on its key
      val scope = Seq("b" -> T2)
      val where =
        if (r.nextBoolean()) s" WHERE ${pred(r, scope, 1)}" else ""
      val joined = Seq("w" -> Seq(Col("k0", 's'), Col("tot", 'i'),
        Col("cnt", 'i')), "c" -> T3)
      val ow =
        if (r.nextBoolean()) s" WHERE ${pred(r, joined, 1)}" else ""
      s"WITH w AS (SELECT b.cat AS k0, SUM(b.amt) AS tot, COUNT(*) " +
        s"AS cnt FROM t2 b$where GROUP BY b.cat) " +
        s"SELECT w.k0 AS ck, w.tot AS c0, w.cnt AS c1, c.label AS " +
        s"c2, (c.boost * ${1 + r.nextInt(5)}) AS c3 " +
        s"FROM w JOIN t3 c ON w.k0 = c.cat$ow"
    }
  }

  /** ROLLUP / CUBE / GROUPING SETS query (round-10 widening).
    * GROUPING(key) flags are projected so super-aggregate NULLs stay
    * distinguishable from data NULLs in the compared output — the
    * classic cross-engine drift spot for these clauses. No ORDER BY
    * needed: the compare sorts rows. */
  private def rollupQuery(r: Random): String = {
    val (t, alias) = if (r.nextBoolean()) ("t1", "a") else ("t2", "b")
    val scope = Seq(alias -> Tables(t))
    val keys = {
      val all = Tables(t).filter(c => "isd".contains(c.kind))
        .map(c => s"$alias.${c.name}")
      r.shuffle(all).take(2)
    }
    val grouping = r.nextInt(3) match {
      case 0 => s"ROLLUP(${keys.mkString(", ")})"
      case 1 => s"CUBE(${keys.mkString(", ")})"
      case _ => s"GROUPING SETS ((${keys.mkString(", ")}), " +
        s"(${keys.head}), ())"
    }
    val where =
      if (r.nextBoolean()) s" WHERE ${pred(r, scope, 1)}" else ""
    val aggs = (0 until 1 + r.nextInt(2))
      .map(i => s"${aggExpr(r, scope)} AS g$i")
    val proj = keys.zipWithIndex.map { case (k, i) => s"$k AS k$i" } ++
      keys.zipWithIndex.map { case (k, i) => s"GROUPING($k) AS gf$i" } ++
      aggs
    // HAVING COUNT(*) > 0 neutralizes the ONE divergence this family
    // has (found by this fuzzer's first widened run, 5/500 queries):
    // over an EMPTY filtered input the standard (and DuckDB/Postgres)
    // emits a single grand-total row for the () grouping set
    // (COUNT=0, aggs NULL) while Spark's Expand-based implementation
    // emits zero rows. On non-empty input the clause is a no-op —
    // every real group has COUNT(*) >= 1 — so everything else the
    // family generates still diff-tests. Pinned in SqlFuzzSpec's
    // "empty-input ROLLUP" regression test.
    s"SELECT ${proj.mkString(", ")} FROM $t $alias$where " +
      s"GROUP BY $grouping HAVING COUNT(*) > 0"
  }

  /** N queries from one seed — the whole fuzz corpus of a run. */
  def corpus(seed: Long, n: Int): Seq[(String, String)] = {
    val r = new Random(seed)
    (0 until n).map(i => (f"q$i%04d", genQuery(r)))
  }
}
