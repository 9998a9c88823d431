package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine deterministic column helpers.
  *
  * Every function here is reproducible bit-for-bit in DuckDB SQL (the
  * driver's oracle), so operators built on them stay inside the
  * hash-match correctness contract:
  *
  *  - `hash60` — 60-bit hash from the md5 hex prefix. Spark
  *    `conv(substring(md5(s),1,15),16,10)` ≡ DuckDB
  *    `('0x'||substr(md5(s),1,15))::BIGINT`. 60 bits fits BIGINT with
  *    headroom (no overflow semantics to match).
  *  - scaled-integer dot products — float math folded to BIGINT so the
  *    sum is order-independent (exact integer addition) and identical
  *    in both engines; `round()` is half-away-from-zero in both.
  *
  * The reference computes none of this natively — its near-dup /
  * similarity north star is stated in BASELINE.json; shapes follow
  * standard MinHash/SimHash constructions (Broder 1997, Charikar 2002).
  */
object Fns {

  /** The cross-engine JSON-payload gate for `events.props`: both
    * engines' JSON parsers disagree at the margins (DuckDB hard-rejects
    * payloads Spark's lenient `get_json_object` accepts, and vice versa
    * for trailing commas; DuckDB CAST also ROUNDS `'1.5'`→2 where Spark
    * nulls/throws), so BOTH gate on this document-shape regex — inside
    * the gate the parsers and the integer cast agree. ONE definition:
    * the regex, its DuckDB extraction, and its Spark twin must never
    * drift apart or the b-family and e10 stop agreeing about which
    * payloads are valid. The anchored shape captures the integer
    * itself, so gate + extract collapse into ONE regex pass — no JSON
    * parser on either engine (the match guarantees the capture IS
    * `$.k`). Anchoring details that keep the claim exact: `\z`, not
    * `$` (Java regex lets `$` match before a final trailing newline,
    * RE2 does not — a newline-terminated payload would silently
    * diverge), and the capture is bounded to 18 digits so the BIGINT
    * cast can never overflow under ANSI on either engine (a longer
    * run of digits is an invalid payload → NULL, like every other
    * shape violation). Both engines return '' on no match; NULLIF
    * turns that into NULL before the cast. */
  val kExtract = """^\{"k": (-?[0-9]{1,18})\}\z"""

  /** The captured digits as a string — the distinct-count grain. */
  val kStrSql: String = s"NULLIF(regexp_extract(props, '$kExtract', 1), '')"

  /** DuckDB-side gated integer extraction of `props.k`. */
  val kIntSql: String = s"CAST($kStrSql AS BIGINT)"

  /** Spark twin of [[kStrSql]]. */
  def kStr: Column =
    nullif(regexp_extract(col("props"), kExtract, 1), lit(""))

  /** Spark twin of [[kIntSql]]. */
  def kInt: Column = kStr.cast(LongType)

  /** Deterministic 60-bit hash of a string column, identical in Spark
    * and DuckDB. DuckDB equivalent: `('0x'||substr(md5(x),1,15))::BIGINT`.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Single-sourced DuckDB twin of [[hash60]] over a column
    * expression — inline copies of this fragment drift. */
  def hash60Sql(colExpr: String): String =
    s"('0x' || substr(md5(CAST($colExpr AS VARCHAR)), 1, 15))::BIGINT"

  /** Whitespace tokens (csv/safe_eval `split` semantics,
    * reference `safe_eval.py:199-208`). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word 3-gram shingles of a token array; empty when fewer
    * than 3 tokens. DuckDB equivalent:
    * `list_distinct([ws[i]||' '||ws[i+1]||' '||ws[i+2] for i in range(1, len(ws)-1)])`.
    */
  def shingles3(ws: Column): Column =
    when(size(ws) >= 3,
      array_distinct(transform(sequence(lit(1), size(ws) - 2), i =>
        concat_ws(" ",
          element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** [[shingles3]] without the dedup pass — for consumers whose
    * aggregate is duplicate-insensitive (MIN-based minhashing). */
  def shingles3Raw(ws: Column): Column =
    when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2), i =>
        concat_ws(" ",
          element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Σ round(a_i*b_i*1e12) as BIGINT — an exact, order-independent dot
    * product of float arrays (scaled by 1e12). Division by 1e12 and any
    * sqrt happen afterwards in IEEE double, bit-identical across
    * engines. DuckDB:
    * `list_sum(list_transform(list_zip(a,b), x -> round(x[1]::DOUBLE*x[2]::DOUBLE*1e12)::BIGINT))`.
    */
  def dotScaled(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        round(x.cast(DoubleType) * y.cast(DoubleType) * lit(1e12))
          .cast(LongType)),
      lit(0L), (acc, v) => acc + v)

  /** Σ round(a_i²*1e12) as BIGINT — scaled squared L2 norm. */
  def normSqScaled(a: Column): Column = dotScaled(a, a)

  /** Exact cosine from scaled integer dot/norms: every operand is an
    * exactly-representable double (< 2^53), so the double arithmetic
    * is bit-identical in Spark and DuckDB. */
  def cosineFromScaled(dot: Column, na: Column, nb: Column): Column =
    dot.cast(DoubleType) /
      (sqrt(na.cast(DoubleType)) * sqrt(nb.cast(DoubleType)))

  /** Pre-scaled integer vector: sx_i = round(x_i·1e6) as BIGINT. One
    * rounding per element per vector — pair loops over the result stay
    * in pure integer arithmetic (Spark's round() goes through
    * BigDecimal; doing it once per vector instead of once per pair is
    * the difference between 640k and 128M BigDecimal ops in a
    * 200×10k-pair scan). DuckDB:
    * `list_transform(embedding, x -> round(x::DOUBLE*1e6)::BIGINT)`. */
  def scaleVec(a: Column): Column =
    // native single pass ([[graft.functions.ScaleVec1e6]]); identical
    // HALF_UP semantics to the composed
    //   transform(a, x => round(x.cast(double) * 1e6).cast(long))
    // (ExactRound IS Spark round's BigDecimal arithmetic) — the HOF
    // version paid a BigDecimal + Double.toString per ELEMENT
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.ScaleVec1e6(
        org.apache.spark.sql.GraftColumnBridge.expression(a)))

  /** Integer dot product of two pre-scaled vectors. */
  /** 16-bit Morton key: interleave the low 8 bits of two normalized
    * BIGINT dimensions (nu → odd bits, nh → even bits) — the z-order
    * clustering key s18 and [[graft.sources.Compaction.zorderWrite]]
    * share (ONE bit layout, so the planner's zone maps and the
    * writer's files cut along the same curve). DuckDB twin:
    * Σ (((nu >> i) & 1) << (2i+1)) + (((nh >> i) & 1) << (2i)). */
  def morton8(nu: Column, nh: Column): Column =
    (0 until 8).map { i =>
      shiftleft(shiftright(nu, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(nh, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _).cast(LongType)

  def dotInt(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)

  /** Integer squared norm of a pre-scaled vector. */
  def normSqInt(sx: Column): Column =
    aggregate(sx, lit(0L), (acc, v) => acc + v * v)

  /** Percentage-text parse: `"95%"`/`"95"` → 0.95, anything
    * unparseable → the reference's 0.8 default
    * (`outcome_aggregator.py:362-372`). The numeric part is validated
    * by regex before the cast — ANSI mode (Spark 4 default) turns a
    * malformed cast into a runtime error, not a null. */
  def parsePercent(c: Column): Column = {
    val num = regexp_extract(trim(c), "^([0-9]+(?:\\.[0-9]+)?)\\s*%?$", 1)
    coalesce(
      when(num === "", lit(null)).otherwise(num.cast(DoubleType)) / 100.0,
      lit(0.8))
  }

  /** Millisecond duration between two ISO-8601 string timestamps
    * (`session_state.py:146-154`, `run.py:102-109`); null inputs → 0
    * (the reference's still-running convention). */
  def durationMs(startedAt: Column, completedAt: Column): Column =
    // try_to_timestamp: a malformed (non-null) timestamp string is a
    // runtime error under ANSI; the reference's per-document parse
    // treats it as not-completed → 0
    coalesce(
      unix_millis(try_to_timestamp(completedAt)) -
        unix_millis(try_to_timestamp(startedAt)),
      lit(0L))

  /** Code-indicator heuristic of the reference's output validator
    * (`node.py:383-428` `_contains_code_indicators`): true when the
    * text carries code-like markers. Pure contains() — stays inside
    * whole-stage codegen. */
  def containsCodeIndicators(text: Column): Column =
    Seq("def ", "import ", "return ", "{", "();")
      .map(m => text.contains(m)).reduce(_ || _)
}
