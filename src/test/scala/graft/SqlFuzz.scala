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
  * incl. correlated, window functions, CTEs, ROLLUP/CUBE/GROUPING
  * SETS.
  *
  * Round-11 widening (VERDICT r10 ask #3): the grammar is CONFIG-
  * DRIVEN — [[SqlFuzz.Synthetic]] keeps the three adversarial views
  * (NULL-dense, non-ASCII, engineered key overlaps), and
  * [[SqlFuzz.Tpch]] points the SAME shapes at the driver's real
  * sf parquet (lineitem/orders/customer/events/nation: real dates,
  * doubles, FK join keys, 60k-row cardinalities) so dialect coverage
  * meets real data shapes inside the suite.
  *
  * DELIBERATE exclusions, each a documented cross-dialect trap, not a
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

  // kinds: i = integer (bigint/int), s = ascii string, u = string
  //        incl. non-ascii (equality/LIKE/IS NULL only), d = date or
  //        timestamp, f = double
  final case class Col(name: String, kind: Char)

  /** A resolved FROM clause: SQL text, alias→columns scope, and the
    * optional LIMIT total-order anchor — the qualified name of a
    * UNIQUE id on a never-null-extended, never-fanned-out alias. */
  final case class From(sql: String, scope: Seq[(String, Seq[Col])],
      anchor: Option[String])

  /** Wiring of the shared grammar shapes onto a concrete fixture
    * set. Everything structural (join graphs, set-op sides,
    * correlation keys, CTE/rollup tables) is data here; the
    * expression/predicate/body layer in [[Grammar]] is shared. */
  final case class Config(
      tables: Map[String, Seq[Col]],
      strLits: Vector[String],
      likeLits: Vector[String],
      // inclusive year range for DATE literals
      dateYearLo: Int, dateYearHi: Int,
      // magnitude for integer literals in IN lists / comparisons
      intLitMax: Int,
      singles: Seq[From],
      twoWayInner: Seq[From], twoWayLeft: Seq[From],
      threeWay: Seq[From],
      // (table, alias, string col, int col) per UNION/INTERSECT side
      setOpSides: Seq[((String, String, String, String),
        (String, String, String, String))],
      // outer (table, alias, unique id, second int col);
      // inner (table, alias, corr col equated to outer id, scalar col)
      subWiring: (String, String, String, String,
        String, String, String, String),
      // anchor required: window ORDER BY rides the unique id
      windowShapes: Seq[From],
      // CTE shape A: (table, alias, candidate group keys — 's'-kind
      // unless cteAKeyKind says otherwise)
      cteA: Seq[(String, String, Seq[String])],
      cteAKeyKind: Char,
      // CTE shape B: fact grouped by key, joined to a dimension
      // (factTable, factAlias, factKey, factSumCol,
      //  dimTable, dimAlias, dimKey, dimLabelCol, dimBoostCol)
      cteB: (String, String, String, String,
        String, String, String, String, String),
      cteBKeyKind: Char,
      rollupTables: Seq[(String, String)])

  // ------------------------------------------------------------------
  // Profile 1: the synthetic adversarial views (t1/t2/t3 — NULLs in
  // every kind, duplicate group keys, non-ASCII, engineered overlap)
  // ------------------------------------------------------------------
  val T1: Seq[Col] = Seq(Col("id", 'i'), Col("grp", 's'),
    Col("val", 'i'), Col("score", 'f'), Col("d", 'd'), Col("name", 's'))
  val T2: Seq[Col] = Seq(Col("id", 'i'), Col("cat", 's'),
    Col("amt", 'i'), Col("note", 'u'))
  val T3: Seq[Col] = Seq(Col("cat", 's'), Col("label", 's'),
    Col("boost", 'i'))

  val Synthetic: Config = Config(
    tables = Map("t1" -> T1, "t2" -> T2, "t3" -> T3),
    strLits = Vector("a", "b", "x", "foo", "Bar", "m", "z9"),
    likeLits = Vector("a%", "%o%", "_a%", "%z", "%ar%", "f__"),
    dateYearLo = 2023, dateYearHi = 2024,
    intLitMax = 300,
    singles = Seq(
      From("t1 a", Seq("a" -> T1), Some("a.id")),
      From("t2 b", Seq("b" -> T2), Some("b.id")),
      From("t3 c", Seq("c" -> T3), None)),
    twoWayInner = Seq(
      From("t1 a JOIN t2 b ON a.id = b.id",
        Seq("a" -> T1, "b" -> T2), Some("a.id"))),
    twoWayLeft = Seq(
      From("t1 a LEFT JOIN t2 b ON a.id = b.id",
        Seq("a" -> T1, "b" -> T2), Some("a.id"))),
    // join graph notes (unchanged from r10): only a never-fanned-out
    // unique id anchors a LIMIT, so the 3-way joins never take one;
    // LEFT at the END so no null-extended key feeds a further join
    threeWay = Seq(
      From("t1 a JOIN t2 b ON a.id = b.id JOIN t3 c ON b.cat = c.cat",
        Seq("a" -> T1, "b" -> T2, "c" -> T3), None),
      From("t2 b JOIN t3 c ON b.cat = c.cat LEFT JOIN t1 a " +
        "ON a.id = b.id",
        Seq("a" -> T1, "b" -> T2, "c" -> T3), None)),
    setOpSides = Seq(
      (("t1", "a", "grp", "val"), ("t2", "b", "cat", "amt"))),
    subWiring = ("t1", "a", "id", "val", "t2", "b", "id", "amt"),
    windowShapes = Seq(
      From("t1 a", Seq("a" -> T1), Some("a.id")),
      From("t2 b", Seq("b" -> T2), Some("b.id")),
      From("t1 a JOIN t2 b ON a.id = b.id",
        Seq("a" -> T1, "b" -> T2), Some("a.id"))),
    cteA = Seq(("t1", "a", Seq("a.grp", "a.name")),
      ("t2", "b", Seq("b.cat"))),
    cteAKeyKind = 's',
    cteB = ("t2", "b", "cat", "amt", "t3", "c", "cat", "label", "boost"),
    cteBKeyKind = 's',
    rollupTables = Seq(("t1", "a"), ("t2", "b")))

  // ------------------------------------------------------------------
  // Profile 2: the driver's real sf parquet (VERDICT r10 ask #3) —
  // TPC-H-ish decimals-as-doubles, real date ranges, FK join keys,
  // 60k-row lineitem at sf0.01. events.ts (nanos/micros timestamp)
  // stays OUT: the engine contract normalizes it through
  // Tables.load, which plain fuzz views deliberately bypass.
  // ------------------------------------------------------------------
  val Lineitem: Seq[Col] = Seq(Col("l_orderkey", 'i'),
    Col("l_partkey", 'i'), Col("l_suppkey", 'i'),
    Col("l_linenumber", 'i'), Col("l_quantity", 'f'),
    Col("l_extendedprice", 'f'), Col("l_discount", 'f'),
    Col("l_tax", 'f'), Col("l_returnflag", 's'),
    Col("l_linestatus", 's'), Col("l_shipdate", 'd'))
  val Orders: Seq[Col] = Seq(Col("o_orderkey", 'i'),
    Col("o_custkey", 'i'), Col("o_orderstatus", 's'),
    Col("o_totalprice", 'f'), Col("o_orderdate", 'd'),
    Col("o_orderpriority", 's'))
  val Customer: Seq[Col] = Seq(Col("c_custkey", 'i'),
    Col("c_name", 's'), Col("c_nationkey", 'i'),
    Col("c_acctbal", 'f'), Col("c_mktsegment", 's'))
  val Events: Seq[Col] = Seq(Col("event_id", 'i'), Col("user_id", 'i'),
    Col("event_type", 's'), Col("value", 'f'), Col("props", 'u'))
  val Nation: Seq[Col] = Seq(Col("n_nationkey", 'i'),
    Col("n_name", 's'), Col("n_regionkey", 'i'))

  val Tpch: Config = Config(
    tables = Map("lineitem" -> Lineitem, "orders" -> Orders,
      "customer" -> Customer, "events" -> Events, "nation" -> Nation),
    strLits = Vector("A", "N", "R", "F", "O", "click", "purchase",
      "BUILDING", "1-URGENT", "Customer#000000001"),
    likeLits = Vector("%URG%", "A%", "%ING", "%#00000%", "c%", "_-%"),
    dateYearLo = 1992, dateYearHi = 1998,
    intLitMax = 20000,
    // anchors: o_orderkey / c_custkey / event_id are unique;
    // lineitem has only a composite key, so it never anchors a LIMIT
    singles = Seq(
      From("lineitem l", Seq("l" -> Lineitem), None),
      From("orders o", Seq("o" -> Orders), Some("o.o_orderkey")),
      From("customer c", Seq("c" -> Customer), Some("c.c_custkey")),
      From("events e", Seq("e" -> Events), Some("e.event_id")),
      From("nation n", Seq("n" -> Nation), Some("n.n_nationkey"))),
    // the REAL FK graph: customer is unique on the join key, so the
    // orders side is never fanned out and keeps its anchor; the
    // lineitem side fans orders, so those shapes anchor nothing
    twoWayInner = Seq(
      From("orders o JOIN customer c ON o.o_custkey = c.c_custkey",
        Seq("o" -> Orders, "c" -> Customer), Some("o.o_orderkey")),
      From("lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey",
        Seq("l" -> Lineitem, "o" -> Orders), None)),
    twoWayLeft = Seq(
      From("orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey",
        Seq("o" -> Orders, "c" -> Customer), Some("o.o_orderkey")),
      From("customer c LEFT JOIN nation n " +
        "ON c.c_nationkey = n.n_nationkey",
        Seq("c" -> Customer, "n" -> Nation), Some("c.c_custkey"))),
    threeWay = Seq(
      From("lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey",
        Seq("l" -> Lineitem, "o" -> Orders, "c" -> Customer), None),
      From("orders o JOIN customer c ON o.o_custkey = c.c_custkey " +
        "LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey",
        Seq("l" -> Lineitem, "o" -> Orders, "c" -> Customer), None)),
    setOpSides = Seq(
      (("orders", "o", "o_orderpriority", "o_custkey"),
        ("customer", "c", "c_mktsegment", "c_nationkey")),
      (("lineitem", "l", "l_returnflag", "l_suppkey"),
        ("events", "e", "event_type", "user_id"))),
    subWiring = ("customer", "a", "c_custkey", "c_nationkey",
      "orders", "b", "o_custkey", "o_orderkey"),
    windowShapes = Seq(
      From("orders o", Seq("o" -> Orders), Some("o.o_orderkey")),
      From("customer c", Seq("c" -> Customer), Some("c.c_custkey")),
      From("events e", Seq("e" -> Events), Some("e.event_id")),
      From("orders o JOIN customer c ON o.o_custkey = c.c_custkey",
        Seq("o" -> Orders, "c" -> Customer), Some("o.o_orderkey"))),
    cteA = Seq(("orders", "a", Seq("a.o_orderpriority", "a.o_orderstatus")),
      ("lineitem", "a", Seq("a.l_returnflag", "a.l_linestatus")),
      ("events", "a", Seq("a.event_type"))),
    cteAKeyKind = 's',
    cteB = ("customer", "b", "c_nationkey", "c_custkey",
      "nation", "c", "n_nationkey", "n_name", "n_regionkey"),
    cteBKeyKind = 'i',
    rollupTables = Seq(("orders", "a"), ("lineitem", "a"),
      ("events", "a")))

  /** N queries from one seed over a profile — the fuzz corpus of a
    * run. The no-arg overload keeps the synthetic default. */
  def corpus(seed: Long, n: Int): Seq[(String, String)] =
    corpus(Synthetic, seed, n)
  def corpus(cfg: Config, seed: Long, n: Int): Seq[(String, String)] = {
    val g = new Grammar(cfg)
    val r = new Random(seed)
    (0 until n).map(i => (f"q$i%04d", g.genQuery(r)))
  }

  /** The shared grammar shapes, wired by a [[Config]]. */
  final class Grammar(cfg: Config) {

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
        .getOrElse(s"'${pick(r, cfg.strLits)}'")
      if (depth <= 0) leaf
      else r.nextInt(8) match {
        case 0 => leaf
        case 1 => s"'${pick(r, cfg.strLits)}'"
        case 2 => s"LOWER(${strExpr(r, scope, depth - 1)})"
        case 3 => s"UPPER(${strExpr(r, scope, depth - 1)})"
        case 4 => s"(${strExpr(r, scope, depth - 1)} || " +
          s"${strExpr(r, scope, 0)})"
        case 5 => s"SUBSTRING(${strExpr(r, scope, depth - 1)}, " +
          s"${1 + r.nextInt(3)}, ${1 + r.nextInt(4)})"
        case 6 => s"REPLACE(${strExpr(r, scope, depth - 1)}, " +
          s"'${pick(r, cfg.strLits)}', '${pick(r, cfg.strLits)}')"
        case 7 => s"COALESCE(NULLIF(${strExpr(r, scope, 0)}, " +
          s"'${pick(r, cfg.strLits)}'), '${pick(r, cfg.strLits)}')"
      }
    }

    private def dateLit(r: Random): String = {
      val y = cfg.dateYearLo +
        r.nextInt(cfg.dateYearHi - cfg.dateYearLo + 1)
      f"DATE '$y-${1 + r.nextInt(12)}%02d-${1 + r.nextInt(28)}%02d'"
    }

    /** Boolean predicate. */
    private def pred(r: Random, scope: Seq[(String, Seq[Col])],
        depth: Int): String = {
      def leaf: String = r.nextInt(9) match {
        case 0 => s"${intExpr(r, scope, 1)} ${pick(r,
          Seq("=", "<>", "<", "<=", ">", ">="))} ${intExpr(r, scope, 0)}"
        case 1 => s"${strExpr(r, scope, 0)} ${pick(r,
          Seq("=", "<>", "<", ">"))} '${pick(r, cfg.strLits)}'"
        case 2 => s"${colOf(r, scope, "isdfu").get} IS " +
          s"${if (r.nextBoolean()) "" else "NOT "}NULL"
        case 3 => s"${colOf(r, scope, "su").getOrElse("'a'")} LIKE " +
          s"'${pick(r, cfg.likeLits)}'"
        case 4 => s"${intExpr(r, scope, 0)} BETWEEN " +
          s"${r.nextInt(40) - 20} AND ${40 + r.nextInt(cfg.intLitMax)}"
        case 5 => s"${colOf(r, scope, "i").getOrElse("0")} IN (" +
          Seq.fill(2 + r.nextInt(3))(r.nextInt(cfg.intLitMax))
            .mkString(", ") + ")"
        case 6 => s"${colOf(r, scope, "s").getOrElse("'a'")} IN (" +
          Seq.fill(2 + r.nextInt(2))(s"'${pick(r, cfg.strLits)}'")
            .mkString(", ") + ")"
        case 7 => colOf(r, scope, "d") match {
          case Some(c) => s"$c ${pick(r, Seq(">=", "<", "="))} " +
            dateLit(r)
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
    private def aggExpr(r: Random, scope: Seq[(String, Seq[Col])])
        : String =
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
      * the reference's csv_sql sees most. */
    def genQuery(r: Random): String = r.nextInt(26) match {
      case k if k < 7 => body(r, pick(r, cfg.singles))
      case k if k < 12 => body(r, pick(r,
        if (r.nextBoolean()) cfg.twoWayInner else cfg.twoWayLeft))
      case k if k < 14 => body(r, pick(r, cfg.threeWay))
      case k if k < 16 => setOp(r)
      case k if k < 19 => subQuery(r)
      case k if k < 22 => windowQuery(r)
      case k if k < 24 => cteQuery(r)
      case _ => rollupQuery(r)
    }

    /** SELECT body over a resolved FROM: either grouped or plain. */
    private def body(r: Random, f: From): String = {
      val From(from, scope, anchor) = f
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
        if (distinct.isEmpty && anchor.isDefined && r.nextInt(10) < 4) {
          s"SELECT ${proj.mkString(", ")}, ${anchor.get} AS cid FROM " +
            s"$from$where ORDER BY cid ASC NULLS FIRST " +
            s"LIMIT ${5 + r.nextInt(40)}"
        } else
          s"SELECT $distinct${proj.mkString(", ")} FROM $from$where"
      }
    }

    private def setOp(r: Random): String = {
      val op = pick(r, Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT"))
      val (l, rr) = pick(r, cfg.setOpSides)
      def side(t: (String, String, String, String)): String = {
        val (tbl, alias, sCol, iCol) = t
        val scope = Seq(alias -> cfg.tables(tbl))
        val where =
          if (r.nextBoolean()) s" WHERE ${pred(r, scope, 1)}" else ""
        s"SELECT $alias.$sCol AS c0, $alias.$iCol AS c1 FROM $tbl " +
          s"$alias$where"
      }
      s"${side(l)} $op ${side(rr)}"
    }

    private def subQuery(r: Random): String = {
      val (ot, oa, oid, oval, it, ia, icorr, iscalar) = cfg.subWiring
      val scope = Seq(oa -> cfg.tables(ot))
      val innerScope = Seq(ia -> cfg.tables(it))
      r.nextInt(3) match {
        case 0 => // correlated scalar subquery in the projection
          s"SELECT $oa.$oid AS c0, ${strExpr(r, scope, 0)} AS c1, " +
            s"(SELECT MAX($ia.$iscalar) FROM $it $ia WHERE " +
            s"$ia.$icorr = $oa.$oid) AS c2 FROM $ot $oa WHERE " +
            s"${pred(r, scope, 1)}"
        case 1 => // IN subquery
          val inner = s"SELECT $ia.$icorr FROM $it $ia WHERE " +
            s"${pred(r, innerScope, 1)}"
          s"SELECT $oa.$oid AS c0, ${scalarExpr(r, scope)} AS c1 " +
            s"FROM $ot $oa WHERE $oa.$oid IN ($inner)"
        case _ => // [NOT] EXISTS correlated
          val not = if (r.nextBoolean()) "NOT " else ""
          s"SELECT $oa.$oid AS c0, $oa.$oval AS c1 FROM $ot $oa " +
            s"WHERE ${not}EXISTS (SELECT 1 FROM $it $ia WHERE " +
            s"$ia.$icorr = $oa.$oid AND ${pred(r, innerScope, 0)})"
      }
    }

    /** Window-function query. Determinism rules: ROW_NUMBER / frames /
      * LAG order by the UNIQUE never-null anchor id (the same
      * total-order anchor LIMIT uses), so row numbering and frame
      * contents are identical in both engines; RANK/DENSE_RANK may
      * order by a non-unique expression (ties collapse to the same
      * rank either way) but then carry the explicit NULLS FIRST both
      * dialects need to agree on; whole-partition aggregates take no
      * ORDER BY at all (the frame is the full partition — no peer-row
      * RANGE subtleties). */
    private def windowQuery(r: Random): String = {
      val From(from, scope, anchor) = pick(r, cfg.windowShapes)
      val id = anchor.get // windowShapes are anchor-required wiring
      val part = colOf(r, scope, "s").get // nullable: NULL is its own
      // partition in both engines
      val wexprs = (0 until 1 + r.nextInt(3)).map { i =>
        val e = r.nextInt(6) match {
          case 0 => s"ROW_NUMBER() OVER (PARTITION BY $part " +
            s"ORDER BY $id ASC NULLS FIRST)"
          case 1 => s"${pick(r, Seq("RANK", "DENSE_RANK"))}() OVER (" +
            s"PARTITION BY $part ORDER BY ${intExpr(r, scope, 1)} " +
            s"${pick(r, Seq("ASC", "DESC"))} NULLS FIRST)"
          case 2 => s"${pick(r, Seq("SUM", "MIN", "MAX", "COUNT"))}(" +
            s"${colOf(r, scope, "i").get}) OVER (PARTITION BY $part)"
          case 3 => s"SUM(${intExpr(r, scope, 0)}) OVER (PARTITION BY " +
            s"$part ORDER BY $id ASC NULLS FIRST ROWS BETWEEN " +
            "UNBOUNDED PRECEDING AND CURRENT ROW)"
          case 4 => s"${pick(r, Seq("LAG", "LEAD"))}(" +
            s"${colOf(r, scope, "is").get}, ${1 + r.nextInt(2)}) OVER (" +
            s"PARTITION BY $part ORDER BY $id ASC NULLS FIRST)"
          case 5 => s"COUNT(*) OVER (ORDER BY $id ASC NULLS FIRST " +
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
      s"SELECT $id AS cid, $part AS c0, ${wexprs.mkString(", ")} " +
        s"FROM $from$where$tail"
    }

    /** CTE query: a grouped WITH body consumed by an outer SELECT —
      * alone or joined back to a dimension. The outer scope types come
      * from the CTE's own projection, so outer predicates/arithmetic
      * exercise the analyzer's CTE column resolution in both
      * dialects. */
    private def cteQuery(r: Random): String = {
      if (r.nextBoolean()) {
        // shape A: WITH w AS (group fact) SELECT ... FROM w WHERE ...
        val (t, alias, keyCands) = pick(r, cfg.cteA)
        val key = pick(r, keyCands)
        val scope = Seq(alias -> cfg.tables(t))
        val where =
          if (r.nextBoolean()) s" WHERE ${pred(r, scope, 1)}" else ""
        val inner = s"SELECT $key AS k0, COUNT(*) AS cnt, " +
          s"SUM(${intExpr(r, scope, 1)}) AS s0, " +
          s"MAX(${colOf(r, scope, "i").get}) AS m0 FROM $t $alias" +
          s"$where GROUP BY $key"
        val wScope = Seq("w" -> Seq(Col("k0", cfg.cteAKeyKind),
          Col("cnt", 'i'), Col("s0", 'i'), Col("m0", 'i')))
        val proj = (0 until 1 + r.nextInt(3))
          .map(i => s"${scalarExpr(r, wScope)} AS c$i")
        val ow =
          if (r.nextBoolean()) s" WHERE ${pred(r, wScope, 1)}" else ""
        s"WITH w AS ($inner) SELECT w.k0 AS ck, ${proj.mkString(", ")} " +
          s"FROM w$ow"
      } else {
        // shape B: the CTE joined back to a dimension on its key
        val (ft, fa, fkey, fsum, dt, da, dkey, dlabel, dboost) = cfg.cteB
        val scope = Seq(fa -> cfg.tables(ft))
        val where =
          if (r.nextBoolean()) s" WHERE ${pred(r, scope, 1)}" else ""
        val joined = Seq("w" -> Seq(Col("k0", cfg.cteBKeyKind),
          Col("tot", 'i'), Col("cnt", 'i')), da -> cfg.tables(dt))
        val ow =
          if (r.nextBoolean()) s" WHERE ${pred(r, joined, 1)}" else ""
        s"WITH w AS (SELECT $fa.$fkey AS k0, SUM($fa.$fsum) AS tot, " +
          s"COUNT(*) AS cnt FROM $ft $fa$where GROUP BY $fa.$fkey) " +
          s"SELECT w.k0 AS ck, w.tot AS c0, w.cnt AS c1, $da.$dlabel " +
          s"AS c2, ($da.$dboost * ${1 + r.nextInt(5)}) AS c3 " +
          s"FROM w JOIN $dt $da ON w.k0 = $da.$dkey$ow"
      }
    }

    /** ROLLUP / CUBE / GROUPING SETS query. GROUPING(key) flags are
      * projected so super-aggregate NULLs stay distinguishable from
      * data NULLs in the compared output — the classic cross-engine
      * drift spot for these clauses. No ORDER BY needed: the compare
      * sorts rows. */
    private def rollupQuery(r: Random): String = {
      val (t, alias) = pick(r, cfg.rollupTables)
      val scope = Seq(alias -> cfg.tables(t))
      val keys = {
        val all = cfg.tables(t).filter(c => "isd".contains(c.kind))
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
  }
}
