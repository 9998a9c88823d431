package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Balanced-brace JSON extraction and heuristic repair — the
  * reference's LLM-output cleaning path (`core/framework/graph/
  * node.py:33-138`: `_fix_unescaped_newlines_in_json`,
  * `find_json_object`).
  *
  * These run OUTSIDE the deterministic oracle contract (they clean
  * free-form LLM text, SURVEY §2.8) and are therefore plain Scala +
  * a UDF boundary, not Catalyst expressions. The state machines are
  * single-pass; the fast path delegates validity checking to Jackson
  * (the JVM analog of the reference's C-extension `json.loads` fast
  * path, `node.py:102`), giving the same asymptotics the reference
  * regression-tests (500 KB < 0.5 s, `test_node_json_performance.py`).
  */
object JsonRepair {

  // FAIL_ON_TRAILING_TOKENS matches json.loads semantics — without it
  // Jackson accepts `{...} {...}` (parses the first token only) and the
  // fast path would return multi-object spans
  private val mapper = new ObjectMapper().enable(
    com.fasterxml.jackson.databind.DeserializationFeature
      .FAIL_ON_TRAILING_TOKENS)

  private def parses(s: String): Boolean =
    try { mapper.readTree(s); true }
    catch { case _: Exception => false }

  /** Escape raw newline/CR/tab characters occurring INSIDE string
    * values (`node.py:33-86`). Structure characters outside strings are
    * untouched. */
  def fixUnescapedNewlines(json: String): String = {
    val out = new StringBuilder(json.length + 16)
    var inString = false
    var escapeNext = false
    var i = 0
    while (i < json.length) {
      val c = json.charAt(i)
      if (escapeNext) { out.append(c); escapeNext = false }
      else if (c == '\\' && inString) { out.append(c); escapeNext = true }
      else if (c == '"') { inString = !inString; out.append(c) }
      else if (inString && c == '\n') out.append("\\n")
      else if (inString && c == '\r') out.append("\\r")
      else if (inString && c == '\t') out.append("\\t")
      else out.append(c)
      i += 1
    }
    out.toString
  }

  /** First balanced JSON object in `text`, or None (`node.py:89-138`).
    * Fast path: the widest `{...}` span, validated in one parse; slow
    * path: string-aware depth counting from the first `{`. */
  def findJsonObject(text: String): Option[String] = {
    val start = text.indexOf('{')
    if (start == -1) return None
    val end = text.lastIndexOf('}')
    if (end == -1 || end < start) return None

    val candidate = text.substring(start, end + 1)
    if (parses(candidate)) return Some(candidate)

    var depth = 0
    var inString = false
    var escapeNext = false
    var i = start
    while (i < text.length) {
      val c = text.charAt(i)
      if (escapeNext) escapeNext = false
      else if (c == '\\' && inString) escapeNext = true
      else if (c == '"') inString = !inString
      else if (!inString) {
        if (c == '{') depth += 1
        else if (c == '}') {
          depth -= 1
          if (depth == 0) return Some(text.substring(start, i + 1))
        }
      }
      i += 1
    }
    None
  }

  /** Extraction + repair pipeline: locate the object, return it if it
    * parses, else apply the newline repair and return that when it
    * parses (`output_cleaner.py:19-62` heuristic tier; the LLM tier
    * stays a pluggable boundary, SURVEY §7.4.1). */
  def extractAndRepair(text: String): Option[String] =
    findJsonObject(text).flatMap { obj =>
      if (parses(obj)) Some(obj)
      else {
        val fixed = fixUnescapedNewlines(obj)
        if (parses(fixed)) Some(fixed) else None
      }
    }

  /** UDF boundary for DataFrame pipelines over raw LLM text. */
  val extractJsonUdf =
    udf((s: String) => if (s == null) None else extractAndRepair(s))

  def extractJson(c: Column): Column = extractJsonUdf(c)
}
