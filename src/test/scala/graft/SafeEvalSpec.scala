package graft

import graft.functions.SafeEval
import graft.functions.SafeEval.SafeEvalException
import org.apache.spark.sql.types._

/** The translator must agree with the Python interpreter's semantics
  * on safe_eval's documented surface (safe_eval.py:6-53 whitelists). */
class SafeEvalSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (1, 5.0, "Hello World", Seq("a", "b"), Map("k" -> "v", "n" -> "3")),
    (2, -2.5, "  pad  ", Seq("x"), Map("k" -> "w")))
    .toDF("i", "d", "s", "arr", "m")
  private val schema = df.schema

  private def evalRow0(expr: String): Any =
    df.select(SafeEval.compile(expr, schema)).head().get(0)

  test("arithmetic incl. python floor-div, mod, power") {
    assert(evalRow0("i + 2 * 3") === 7L)
    assert(evalRow0("7 // 2") === 3L)
    assert(evalRow0("-7 % 3") === 2L) // python semantics: pmod
    assert(evalRow0("2 ** 3") === 8.0)
    assert(evalRow0("d / 2") === 2.5)
  }

  test("chained comparisons become conjunctions") {
    assert(evalRow0("0 < i < 2") === true)
    assert(evalRow0("0 < i < 1") === false)
    assert(evalRow0("1 <= i <= 1 == 1") === true)
  }

  test("boolean ops, not, ternary") {
    assert(evalRow0("i == 1 and d > 0") === true)
    assert(evalRow0("i == 2 or d > 0") === true)
    assert(evalRow0("not (i == 2)") === true)
    assert(evalRow0("'yes' if i == 1 else 'no'") === "yes")
  }

  test("in / not in over arrays, maps and strings") {
    assert(evalRow0("'a' in arr") === true)
    assert(evalRow0("'z' not in arr") === true)
    assert(evalRow0("'k' in m") === true)
    assert(evalRow0("'World' in s") === true)
  }

  test("safe functions") {
    assert(evalRow0("len(s)") === 11)
    assert(evalRow0("len(arr)") === 2)
    assert(evalRow0("min(i, 0)") === 0L)
    assert(evalRow0("max(3, i)") === 3L)
    assert(evalRow0("abs(0 - i)") === 1L)
    assert(evalRow0("int('42')") === 42L)
    assert(evalRow0("float(i)") === 1.0)
    assert(evalRow0("str(i)") === "1")
    assert(evalRow0("round(d + 0.4)") === 5.0)
  }

  test("whitelisted methods") {
    assert(evalRow0("s.lower()") === "hello world")
    assert(evalRow0("s.upper()") === "HELLO WORLD")
    assert(evalRow0("m.get('k')") === "v")
    assert(evalRow0("m.get('zz', 'dflt')") === "dflt")
    assert(evalRow0("s.split(' ')[0]") === "Hello")
    assert(evalRow0("arr[0]") === "a")
    assert(evalRow0("arr[-1]") === "b")
  }

  test("non-whitelisted callables are rejected at compile time") {
    intercept[SafeEvalException](SafeEval.compile("open('/etc/passwd')"))
    intercept[SafeEvalException](SafeEval.compile("s.__class__", schema))
    intercept[SafeEvalException](SafeEval.compile("arr.append(1)", schema))
  }

  test("malformed numeric literals raise SafeEvalException, " +
      "not NumberFormatException (lexer parity)") {
    intercept[SafeEvalException](SafeEval.compile("1.2.3"))
    intercept[SafeEvalException](SafeEval.compile("i + 1.2.3", schema))
    // valid forms still lex
    assert(evalRow0("1.5 + .5") === 2.0)
  }

  test("backslash escapes in string literals (python lexer semantics)") {
    assert(evalRow0("""'it\'s'""") === "it's")
    assert(evalRow0(""""say \"hi\"""" + "\"") === "say \"hi\"")
    assert(evalRow0("""'a\nb'""") === "a\nb")
    assert(evalRow0("""'a\tb'""") === "a\tb")
    assert(evalRow0("""'back\\slash'""") === "back\\slash")
    // unknown escape keeps the backslash, as Python does
    assert(evalRow0("""'a\qb'""") === "a\\qb")
    // an escaped quote must not terminate the literal early
    assert(evalRow0("""len('it\'s')""") === 4)
    // full Python lexer escape set
    assert(evalRow0("""'\x41'""") === "A")
    assert(evalRow0("'" + "\\u0041" + "'") === "A")
    assert(evalRow0("""'\101'""") === "A") // octal
    assert(evalRow0("""'\a\v\f'""") ===
      new String(Array(7.toChar, 11.toChar, '\f')))
    intercept[SafeEvalException](SafeEval.compile("""'\xZZ'"""))
  }

  test("condition(): errors/nulls collapse to false (edge.py:200-204)") {
    val got = df.select(SafeEval.condition("m.get('zz') == 'v'", schema))
      .collect().map(_.getBoolean(0))
    assert(got === Array(false, false))
  }

  test("None comparisons are null checks (python x != None semantics)") {
    assert(evalRow0("m.get('zz') == None") === true)
    assert(evalRow0("m.get('zz') != None") === false)
    assert(evalRow0("m.get('k') != None") === true)
    assert(evalRow0("None == m.get('zz')") === true)
  }

  test("failed evaluations collapse to False in condition() " +
      "(edge.py:200-204, ANSI-safe)") {
    // ZeroDivisionError → False
    assert(df.select(SafeEval.condition("1 / (i - 1) > 0", schema))
      .head().getBoolean(0) === false) // i=1 → div by zero
    // ValueError from int('abc') → False
    assert(df.select(SafeEval.condition("int(m.get('k')) > 0", schema))
      .head().getBoolean(0) === false) // 'v' is not an int
    // IndexError from out-of-range subscript → False
    assert(df.select(SafeEval.condition("arr[9] == 'a'", schema))
      .head().getBoolean(0) === false)
    // the numeric map value parses
    assert(df.select(SafeEval.condition("int(m.get('n')) == 3", schema))
      .head().getBoolean(0) === true)
    // a non-boolean string as the whole condition: ANSI cast would
    // throw; TRY-mode yields null → False
    assert(df.select(SafeEval.condition("m.get('k')", schema))
      .head().getBoolean(0) === false)
    assert(df.select(SafeEval.condition("m.get('k') and i == 1", schema))
      .head().getBoolean(0) === false)
  }

  test("map .get on a missing key yields None under ANSI, never throws " +
      "(dict.get contract)") {
    // ANSI element_at would raise MAP_KEY_DOES_NOT_EXIST here; dict.get
    // must be the accessor that can never raise
    assert(evalRow0("m.get('definitely_absent')") === null)
    assert(evalRow0("m.get('definitely_absent', 'dflt')") === "dflt")
    assert(evalRow0("m.get('definitely_absent') == None") === true)
  }

  test("no-arg split() = whitespace-run split dropping empties " +
      "(python str.split())") {
    val df2 = Seq("a  b", "\ta b\nc ", "only").toDF("s")
    val got = df2.select(SafeEval.compile("len(s.split())", df2.schema))
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(2, 3, 1))
    // explicit separator keeps empties (python parity the other way)
    assert(evalRow0("len(s.split(' '))") === 2)
  }

  test("split is literal like python str.split, not regex") {
    val df2 = Seq("a.b.c").toDF("s")
    assert(df2.select(SafeEval.compile("len(s.split('.'))", df2.schema))
      .head().getInt(0) === 3)
    assert(df2.select(SafeEval.compile("s.split('.')[1]", df2.schema))
      .head().getString(0) === "b")
  }

  test("round honors ndigits") {
    assert(evalRow0("round(2.345, 2)") === 2.35)
    assert(evalRow0("round(2.5)") === 3.0)
  }

  // Property test (SURVEY §5): on randomly generated expressions from
  // the integer/boolean fragment of the grammar, the Catalyst
  // translation must agree with a direct Python-semantics interpreter.
  // Seeded generator → reproducible; one Spark job for all samples.
  test("property: translator ≡ Python-semantics interpreter on random exprs") {
    val rnd = new scala.util.Random(42)
    val iVal = 3L
    val jVal = -4L

    // (expression text, reference value as Any)
    def genInt(depth: Int): (String, Long) =
      rnd.nextInt(if (depth > 3) 4 else 7) match {
        case 0 => val n = rnd.nextInt(11); (n.toString, n.toLong)
        case 1 => ("i2", iVal)
        case 2 => ("j2", jVal)
        case 3 => val n = rnd.nextInt(10) + 1; (n.toString, n.toLong)
        case 4 =>
          val (a, av) = genInt(depth + 1); val (b, bv) = genInt(depth + 1)
          (s"($a + $b)", av + bv)
        case 5 =>
          val (a, av) = genInt(depth + 1); val (b, bv) = genInt(depth + 1)
          (s"($a - $b)", av - bv)
        case 6 =>
          val (a, av) = genInt(depth + 1); val (b, bv) = genInt(depth + 1)
          (s"($a * $b)", av * bv)
      }

    def genBool(depth: Int): (String, Boolean) =
      rnd.nextInt(if (depth > 3) 3 else 6) match {
        case 0 =>
          val (a, av) = genInt(depth + 1); val (b, bv) = genInt(depth + 1)
          (s"$a < $b", av < bv)
        case 1 =>
          val (a, av) = genInt(depth + 1); val (b, bv) = genInt(depth + 1)
          (s"$a == $b", av == bv)
        case 2 =>
          val (a, av) = genInt(depth + 1); val (b, bv) = genInt(depth + 1)
          (s"$a >= $b", av >= bv)
        case 3 =>
          val (a, av) = genBool(depth + 1); val (b, bv) = genBool(depth + 1)
          (s"($a and $b)", av && bv)
        case 4 =>
          val (a, av) = genBool(depth + 1); val (b, bv) = genBool(depth + 1)
          (s"($a or $b)", av || bv)
        case 5 =>
          val (a, av) = genBool(depth + 1); (s"(not $a)", !av)
      }

    // string fragment: literals + whitelisted methods + membership
    val pool = Seq("alpha", "Beta", "  pad  ", "x", "")
    def genStr(depth: Int): (String, String) =
      rnd.nextInt(if (depth > 2) 1 else 4) match {
        case 0 =>
          val v = pool(rnd.nextInt(pool.length)); (s"'$v'", v)
        case 1 =>
          val (e, v) = genStr(depth + 1); (s"$e.lower()", v.toLowerCase)
        case 2 =>
          val (e, v) = genStr(depth + 1); (s"$e.upper()", v.toUpperCase)
        case 3 =>
          val (e, v) = genStr(depth + 1); (s"$e.strip()", v.trim)
      }

    def genStrBool(): (String, Boolean) =
      rnd.nextInt(3) match {
        case 0 =>
          val (a, av) = genStr(0); val (b, bv) = genStr(0)
          (s"$a == $b", av == bv)
        case 1 =>
          val (a, av) = genStr(0); val (b, bv) = genStr(0)
          (s"$a != $b", av != bv)
        case 2 => // python `in` on strings = substring containment
          val (a, av) = genStr(1); val (b, bv) = genStr(1)
          (s"$a in $b", bv.contains(av))
      }

    val samples = (1 to 180).map { k =>
      k % 3 match {
        case 0 => val (e, v) = genInt(0); (e, v: Any)
        case 1 => val (e, v) = genBool(0); (e, v: Any)
        case 2 => val (e, v) = genStrBool(); (e, v: Any)
      }
    }
    val base = Seq((iVal, jVal)).toDF("i2", "j2")
    val s2 = base.schema
    val cols = samples.zipWithIndex.map { case ((e, _), idx) =>
      SafeEval.compile(e, s2).cast(StringType).as(s"c$idx")
    }
    val row = base.select(cols: _*).head()
    samples.zipWithIndex.foreach { case ((e, expected), idx) =>
      val got = row.getString(idx)
      assert(got === expected.toString, s"expr[$idx]: $e")
    }
  }
}
