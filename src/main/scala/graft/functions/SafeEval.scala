package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Translator from the reference's `safe_eval` predicate language to
  * Catalyst `Column` expressions.
  *
  * The reference evaluates edge conditions with an AST-whitelisted
  * Python expression interpreter (`core/framework/graph/safe_eval.py:
  * 6-53` whitelists, `:56-222` visitor): arithmetic, comparisons
  * (including chained), boolean ops, `in`, ternary, subscript,
  * attribute access, the safe functions `len/int/float/str/bool/min/
  * max/sum/abs/round/all/any` and methods `get/keys/values/items/
  * lower/upper/strip/split`. Here the same grammar compiles to a
  * declarative `Column`, so a routing predicate evaluates inside
  * whole-stage codegen over millions of rows instead of row-at-a-time
  * in an interpreter — no custom Catalyst extension needed (every
  * construct has a builtin; SURVEY §2.2, §4.2b).
  *
  * Typing: an optional schema drives the `len`→`length`/`size` and
  * `in`→`contains`/`array_contains`/`map_contains_key` choices the
  * Python interpreter makes dynamically.
  */
object SafeEval {

  final class SafeEvalException(msg: String) extends Exception(msg)

  // ----- AST ------------------------------------------------------
  private sealed trait Ast
  private case class Num(v: Double, isInt: Boolean) extends Ast
  private case class Str(v: String) extends Ast
  private case class Bool(v: Boolean) extends Ast
  private case object NoneLit extends Ast
  private case class Name(n: String) extends Ast
  private case class ListLit(xs: List[Ast]) extends Ast
  private case class Unary(op: String, a: Ast) extends Ast
  private case class Bin(op: String, a: Ast, b: Ast) extends Ast
  private case class BoolOp(op: String, xs: List[Ast]) extends Ast
  private case class Cmp(first: Ast, rest: List[(String, Ast)]) extends Ast
  private case class Ternary(c: Ast, a: Ast, b: Ast) extends Ast
  private case class Attr(o: Ast, name: String) extends Ast
  private case class Index(o: Ast, k: Ast) extends Ast
  private case class Call(f: String, args: List[Ast]) extends Ast
  private case class Method(o: Ast, m: String, args: List[Ast]) extends Ast

  // ----- Tokenizer ------------------------------------------------
  private case class Tok(kind: String, text: String)

  private val twoCharOps = Seq("**", "//", "==", "!=", "<=", ">=")
  private val oneCharOps = "+-*/%()[],.<>".toSet

  private def isHex(c: Char): Boolean =
    c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def tokenize(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < s.length && s(i + 1).isDigit)) {
        val start = i
        while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
        val t = s.substring(start, i)
        // a malformed literal like 1.2.3 must fail as a SafeEvalException
        // at parse, not escape later as NumberFormatException (the
        // Python lexer this mirrors rejects it as a SyntaxError)
        if (t.count(_ == '.') > 1)
          throw new SafeEvalException(s"bad numeric literal '$t'")
        out += Tok("num", t)
      } else if (c == '\'' || c == '"') {
        val q = c; i += 1
        val sb = new StringBuilder
        // Python string-literal escapes (the Python lexer set the
        // reference's ast.parse applies): \n \t \r \a \b \f \v \' \"
        // \\ \0-\777 octal, \xhh, \uXXXX; an unrecognized escape keeps
        // the backslash, as Python does
        while (i < s.length && s(i) != q) {
          if (s(i) == '\\' && i + 1 < s.length) {
            val e = s(i + 1)
            e match {
              case 'n' => sb += '\n'; i += 2
              case 't' => sb += '\t'; i += 2
              case 'r' => sb += '\r'; i += 2
              case 'a' => sb += 7.toChar; i += 2
              case 'b' => sb += '\b'; i += 2
              case 'f' => sb += '\f'; i += 2
              case 'v' => sb += 11.toChar; i += 2
              case '\'' => sb += '\''; i += 2
              case '"' => sb += '"'; i += 2
              case '\\' => sb += '\\'; i += 2
              case 'x' =>
                if (i + 3 >= s.length ||
                    !s.substring(i + 2, i + 4).forall(isHex))
                  throw new SafeEvalException("invalid \\x escape")
                sb += Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar
                i += 4
              case 'u' =>
                if (i + 5 >= s.length ||
                    !s.substring(i + 2, i + 6).forall(isHex))
                  throw new SafeEvalException("invalid \\u escape")
                sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
                i += 6
              case o if o >= '0' && o <= '7' =>
                val end = math.min(i + 4, s.length)
                var j = i + 1
                while (j < end && s(j) >= '0' && s(j) <= '7') j += 1
                sb += Integer.parseInt(s.substring(i + 1, j), 8).toChar
                i = j
              case other => sb += '\\'; sb += other; i += 2
            }
          } else { sb += s(i); i += 1 }
        }
        if (i >= s.length) throw new SafeEvalException("unterminated string")
        out += Tok("str", sb.toString); i += 1
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += Tok("name", s.substring(start, i))
      } else if (i + 1 < s.length &&
          twoCharOps.contains(s.substring(i, i + 2))) {
        out += Tok("op", s.substring(i, i + 2)); i += 2
      } else if (oneCharOps.contains(c)) {
        out += Tok("op", c.toString); i += 1
      } else throw new SafeEvalException(s"unexpected char '$c'")
    }
    out.toList
  }

  // ----- Parser (Python expression precedence) --------------------
  private class Parser(var toks: List[Tok]) {
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val t = toks.head; toks = toks.tail; t }
    def accept(kind: String, text: String): Boolean = peek match {
      case Some(Tok(k, t)) if k == kind && t == text => next(); true
      case _ => false
    }
    def expect(text: String): Unit =
      if (!accept("op", text) && !accept("name", text))
        throw new SafeEvalException(s"expected '$text' at $toks")

    def parse(): Ast = {
      val e = ternary()
      if (toks.nonEmpty)
        throw new SafeEvalException(s"trailing tokens: $toks")
      e
    }

    def ternary(): Ast = {
      val a = orExpr()
      if (accept("name", "if")) {
        val c = orExpr(); expect("else"); Ternary(c, a, ternary())
      } else a
    }

    def orExpr(): Ast = {
      var xs = List(andExpr())
      while (accept("name", "or")) xs :+= andExpr()
      if (xs.size == 1) xs.head else BoolOp("or", xs)
    }

    def andExpr(): Ast = {
      var xs = List(notExpr())
      while (accept("name", "and")) xs :+= notExpr()
      if (xs.size == 1) xs.head else BoolOp("and", xs)
    }

    def notExpr(): Ast =
      if (accept("name", "not")) Unary("not", notExpr()) else comparison()

    def comparison(): Ast = {
      val a = arith()
      var rest = List.empty[(String, Ast)]
      var go = true
      while (go) {
        val opOpt = peek match {
          case Some(Tok("op", o))
              if Seq("==", "!=", "<", "<=", ">", ">=").contains(o) =>
            next(); Some(o)
          case Some(Tok("name", "in")) => next(); Some("in")
          case Some(Tok("name", "not")) =>
            next(); expect("in"); Some("not in")
          case _ => None
        }
        opOpt match {
          case Some(o) => rest :+= (o -> arith())
          case None => go = false
        }
      }
      if (rest.isEmpty) a else Cmp(a, rest)
    }

    def arith(): Ast = {
      var a = term()
      var go = true
      while (go) {
        if (accept("op", "+")) a = Bin("+", a, term())
        else if (accept("op", "-")) a = Bin("-", a, term())
        else go = false
      }
      a
    }

    def term(): Ast = {
      var a = factor()
      var go = true
      while (go) {
        if (accept("op", "*")) a = Bin("*", a, factor())
        else if (accept("op", "//")) a = Bin("//", a, factor())
        else if (accept("op", "/")) a = Bin("/", a, factor())
        else if (accept("op", "%")) a = Bin("%", a, factor())
        else go = false
      }
      a
    }

    def factor(): Ast =
      if (accept("op", "-")) Unary("-", factor())
      else if (accept("op", "+")) factor()
      else power()

    def power(): Ast = {
      val a = postfix()
      if (accept("op", "**")) Bin("**", a, factor()) else a
    }

    def postfix(): Ast = {
      var a = atom()
      var go = true
      while (go) {
        if (accept("op", ".")) {
          val n = next().text
          if (accept("op", "(")) a = Method(a, n, callArgs())
          else a = Attr(a, n)
        } else if (accept("op", "[")) {
          val k = ternary(); expect("]"); a = Index(a, k)
        } else go = false
      }
      a
    }

    def callArgs(): List[Ast] = {
      if (accept("op", ")")) return Nil
      var args = List(ternary())
      while (accept("op", ",")) args :+= ternary()
      expect(")")
      args
    }

    def atom(): Ast = peek match {
      case Some(Tok("num", t)) =>
        next(); Num(t.toDouble, !t.contains('.'))
      case Some(Tok("str", t)) => next(); Str(t)
      case Some(Tok("name", "True")) => next(); Bool(true)
      case Some(Tok("name", "False")) => next(); Bool(false)
      case Some(Tok("name", "None")) => next(); NoneLit
      case Some(Tok("name", n)) =>
        next()
        if (accept("op", "(")) Call(n, callArgs()) else Name(n)
      case Some(Tok("op", "(")) =>
        next(); val e = ternary(); expect(")"); e
      case Some(Tok("op", "[")) =>
        next()
        if (accept("op", "]")) ListLit(Nil)
        else {
          var xs = List(ternary())
          while (accept("op", ",")) xs :+= ternary()
          expect("]")
          ListLit(xs)
        }
      case t => throw new SafeEvalException(s"unexpected token $t")
    }
  }

  // ----- Compilation to Column ------------------------------------
  /** Column + statically-known type (when derivable from the schema). */
  private case class TV(c: Column, dt: Option[DataType])

  private val safeFns = Set("len", "int", "float", "str", "bool", "min",
    "max", "sum", "abs", "round", "all", "any")

  /** Compile a safe_eval expression against an optional row schema. */
  def compile(expression: String, schema: StructType = new StructType()): Column =
    compileTyped(expression, schema).c

  private def compileTyped(expression: String, schema: StructType): TV = {
    val ast = new Parser(tokenize(expression)).parse()
    eval(ast, schema)
  }

  /** Edge-condition semantics: a predicate whose evaluation errors is
    * False (`edge.py:200-204`), nulls are False. Translation errors
    * surface at compile time; runtime nulls coalesce. */
  def condition(expression: String,
      schema: StructType = new StructType()): Column =
    coalesce(tryBool(compile(expression, schema)), lit(false))

  /** TRY-mode boolean cast: under Spark 4's ANSI default a plain
    * cast('done' AS BOOLEAN) is a runtime error that would abort the
    * job, while the edge contract maps failed evaluations to False
    * (`edge.py:200-204`) — TRY yields null, which condition()
    * coalesces. (Python truthiness of arbitrary strings remains a
    * documented delta, FIXTURES §8.) */
  private def tryBool(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.GraftColumnBridge.expression(c),
        BooleanType, None,
        org.apache.spark.sql.catalyst.expressions.EvalMode.TRY))

  private def fieldType(schema: StructType, n: String): Option[DataType] =
    schema.fields.find(_.name == n).map(_.dataType)

  private def eval(ast: Ast, schema: StructType): TV = ast match {
    case Num(v, isInt) =>
      if (isInt) TV(lit(v.toLong), Some(LongType))
      else TV(lit(v), Some(DoubleType))
    case Str(v) => TV(lit(v), Some(StringType))
    case Bool(v) => TV(lit(v), Some(BooleanType))
    case NoneLit => TV(lit(null), None)
    case Name(n) => TV(col(n), fieldType(schema, n))
    case ListLit(xs) =>
      val vs = xs.map(eval(_, schema))
      TV(array(vs.map(_.c): _*),
        vs.headOption.flatMap(_.dt).map(ArrayType(_)))

    case Unary("not", a) => TV(!tryBool(eval(a, schema).c),
      Some(BooleanType))
    case Unary("-", a) =>
      val t = eval(a, schema); TV(negate(t.c), t.dt)
    case Unary(op, _) => throw new SafeEvalException(s"unary $op")

    case Bin(op, a, b) =>
      val (x, y) = (eval(a, schema), eval(b, schema))
      op match {
        case "+" => TV(x.c + y.c, x.dt.orElse(y.dt))
        case "-" => TV(x.c - y.c, x.dt.orElse(y.dt))
        case "*" => TV(x.c * y.c, x.dt.orElse(y.dt))
        // try_divide: Python raises ZeroDivisionError and the edge
        // contract maps failed evals to False (edge.py:200-204); under
        // Spark's ANSI default a plain `/` would instead abort the job
        case "/" => TV(try_divide(x.c, y.c), Some(DoubleType))
        case "//" =>
          TV(floor(try_divide(x.c, y.c)).cast(LongType), Some(LongType))
        // python % with positive divisor == pmod; zero divisor → null
        case "%" => TV(when(y.c === 0, lit(null))
          .otherwise(pmod(x.c, y.c)), x.dt)
        case "**" => TV(pow(x.c, y.c), Some(DoubleType))
        case o => throw new SafeEvalException(s"binary $o")
      }

    case BoolOp("and", xs) =>
      TV(xs.map(x => tryBool(eval(x, schema).c)).reduce(_ && _),
        Some(BooleanType))
    case BoolOp("or", xs) =>
      TV(xs.map(x => tryBool(eval(x, schema).c)).reduce(_ || _),
        Some(BooleanType))
    case BoolOp(op, _) => throw new SafeEvalException(s"boolop $op")

    // chained comparison a < b <= c -> (a<b) AND (b<=c) (safe_eval.py:
    // visitor handles ast.Compare with multiple ops the same way)
    case Cmp(first, rest) =>
      var prev = eval(first, schema)
      var prevAst = first
      val parts = rest.map { case (op, bAst) =>
        val b = eval(bAst, schema)
        // Python `x == None` / `x != None` are null CHECKS; a SQL
        // =/<> against a null literal is null for every row (and the
        // condition() wrapper would collapse it to constant-false)
        val noneSide =
          if (bAst == NoneLit) Some(prev.c)
          else if (prevAst == NoneLit) Some(b.c)
          else None
        val p = (op, noneSide) match {
          case ("==", Some(c)) => c.isNull
          case ("!=", Some(c)) => c.isNotNull
          case ("==", None) => prev.c === b.c
          case ("!=", None) => prev.c =!= b.c
          case ("<", _) => prev.c < b.c
          case ("<=", _) => prev.c <= b.c
          case (">", _) => prev.c > b.c
          case (">=", _) => prev.c >= b.c
          case ("in", _) => inOp(prev, b)
          case ("not in", _) => !inOp(prev, b)
        }
        prev = b
        prevAst = bAst
        p
      }
      TV(parts.reduce(_ && _), Some(BooleanType))

    case Ternary(c, a, b) =>
      val at = eval(a, schema)
      TV(when(tryBool(eval(c, schema).c), at.c)
        .otherwise(eval(b, schema).c), at.dt)

    // attribute access doubles as struct-field access (context rows
    // are flattened output∪memory dicts, edge.py:170-179); _-prefixed
    // attributes are blocked like the reference (safe_eval.py:27-28)
    case Attr(o, n) =>
      if (n.startsWith("_"))
        throw new SafeEvalException(s"attribute '$n' not allowed")
      val t = eval(o, schema)
      val dt = t.dt.collect {
        case StructType(fs) => fs.find(_.name == n).map(_.dataType)
      }.flatten
      TV(t.c.getField(n), dt)

    case Index(o, k) =>
      val t = eval(o, schema)
      val kv = eval(k, schema)
      t.dt match {
        case Some(ArrayType(et, _)) =>
          // python 0-based, element_at 1-based; negative = from end.
          // try_element_at: an out-of-range subscript raises in Python
          // (condition → False), while ANSI element_at aborts the job
          TV(try_element_at(t.c,
            (kv.c + when(kv.c >= 0, 1).otherwise(0))
              .cast(IntegerType)), Some(et))
        case Some(MapType(_, vt, _)) =>
          TV(try_element_at(t.c, kv.c), Some(vt))
        case Some(StructType(_)) => eval(Attr(o, k match {
          case Str(s) => s
          case _ => throw new SafeEvalException("struct index must be str")
        }), schema)
        case _ => TV(try_element_at(t.c, kv.c), None)
      }

    case Call(f, args) =>
      if (!safeFns.contains(f))
        throw new SafeEvalException(s"function '$f' not whitelisted")
      val vs = args.map(eval(_, schema))
      f match {
        case "len" => vs.head.dt match {
          case Some(StringType) => TV(length(vs.head.c), Some(IntegerType))
          case Some(_: ArrayType) | Some(_: MapType) =>
            TV(size(vs.head.c), Some(IntegerType))
          case _ => TV(size(vs.head.c), Some(IntegerType))
        }
        // string inputs are regex-validated before the cast: Python
        // raises on int('abc') and the edge contract maps that to
        // False, while an ANSI cast would abort the job. Known-numeric
        // inputs cast directly (int() truncates toward zero, same as
        // the Python builtin for doubles).
        case "int" => vs.head.dt match {
          case Some(t) if t.isInstanceOf[NumericType] ||
              t == BooleanType =>
            TV(vs.head.c.cast(LongType), Some(LongType))
          case _ => TV(when(
            vs.head.c.cast(StringType).rlike("^\\s*-?[0-9]+\\s*$"),
            trim(vs.head.c.cast(StringType)).cast(LongType)),
            Some(LongType))
        }
        case "float" => vs.head.dt match {
          case Some(t) if t.isInstanceOf[NumericType] ||
              t == BooleanType =>
            TV(vs.head.c.cast(DoubleType), Some(DoubleType))
          case _ => TV(when(
            vs.head.c.cast(StringType)
              .rlike("^\\s*-?[0-9]*\\.?[0-9]+([eE][+-]?[0-9]+)?\\s*$"),
            trim(vs.head.c.cast(StringType)).cast(DoubleType)),
            Some(DoubleType))
        }
        case "str" => TV(vs.head.c.cast(StringType), Some(StringType))
        case "bool" => TV(tryBool(vs.head.c), Some(BooleanType))
        case "abs" => TV(abs(vs.head.c), vs.head.dt)
        case "round" =>
          if (vs.size > 1) args(1) match {
            // the ndigits arg must reach Spark's round as a literal
            // scale — round(c, 0) would silently change the predicate
            case Num(n, true) =>
              TV(round(vs.head.c, n.toInt), Some(DoubleType))
            case _ => throw new SafeEvalException(
              "round() ndigits must be an integer literal")
          }
          else TV(round(vs.head.c), Some(DoubleType))
        case "min" | "max" =>
          if (vs.size == 1) {
            val f2 = if (f == "min") array_min _ else array_max _
            TV(f2(vs.head.c), vs.head.dt.collect {
              case ArrayType(et, _) => et
            })
          } else {
            val cs = vs.map(_.c)
            TV(if (f == "min") least(cs: _*) else greatest(cs: _*),
              vs.head.dt)
          }
        case "sum" =>
          TV(aggregate(vs.head.c, lit(0).cast(
            vs.head.dt.collect { case ArrayType(et, _) => et }
              .getOrElse(DoubleType)), (acc, x) => acc + x), None)
        case "all" => TV(forall(vs.head.c, x => tryBool(x)),
          Some(BooleanType))
        case "any" => TV(exists(vs.head.c, x => tryBool(x)),
          Some(BooleanType))
      }

    case Method(o, m, args) =>
      val t = eval(o, schema)
      val vs = args.map(eval(_, schema))
      m match {
        case "get" =>
          // try_element_at, NOT element_at: dict.get is the one Python
          // accessor that can never raise, while ANSI element_at
          // throws MAP_KEY_DOES_NOT_EXIST for an absent key — a
          // missing-key .get in an edge condition must yield
          // None/default, never abort the job
          val v = try_element_at(t.c, vs.head.c)
          val vt = t.dt.collect { case MapType(_, x, _) => x }
          if (vs.size > 1) TV(coalesce(v, vs(1).c), vt) else TV(v, vt)
        case "keys" => TV(map_keys(t.c),
          t.dt.collect { case MapType(k, _, _) => ArrayType(k) })
        case "values" => TV(map_values(t.c),
          t.dt.collect { case MapType(_, v, _) => ArrayType(v) })
        case "items" => TV(map_entries(t.c), None)
        case "lower" => TV(lower(t.c), Some(StringType))
        case "upper" => TV(upper(t.c), Some(StringType))
        case "strip" => TV(trim(t.c), Some(StringType))
        case "split" =>
          // Python str.split with a separator is LITERAL (quote the
          // regex, keep empty tokens); with NO separator it splits on
          // whitespace RUNS and discards empties — two genuinely
          // different behaviors
          args.headOption match {
            case Some(Str(s)) =>
              TV(split(t.c, java.util.regex.Pattern.quote(s)),
                Some(ArrayType(StringType)))
            case None =>
              TV(filter(split(t.c, "\\s+"), x => length(x) > 0),
                Some(ArrayType(StringType)))
            case _ => throw new SafeEvalException(
              "split() separator must be a string literal")
          }
        case other =>
          throw new SafeEvalException(s"method '$other' not whitelisted")
      }
  }

  private def inOp(x: TV, coll: TV): Column = coll.dt match {
    case Some(StringType) => coll.c.contains(x.c)
    case Some(_: ArrayType) => array_contains(coll.c, x.c)
    case Some(_: MapType) => map_contains_key(coll.c, x.c)
    case _ => array_contains(coll.c, x.c)
  }
}
