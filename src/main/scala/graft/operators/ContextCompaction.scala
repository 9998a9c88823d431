package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic context-compaction analytics (SURVEY §2.10; reference
  * `graph/conversation.py:382-616` + `event_loop_node.py:2265-2432`).
  *
  * The reference compacts a node's message history in two tiers:
  * (1) `prune_old_tool_results` replaces old tool-result content with
  * placeholders once the recent window holds `protect_tokens` worth;
  * (2) `compact` folds everything before a split point into one
  * summary message, extracting declared output-key values first so
  * they survive. The LLM writes the summary TEXT; every decision
  * about WHICH rows prune/compact and WHAT must be preserved is
  * deterministic — that decision pipeline is what this operator
  * re-expresses, vectorized over N conversations at once (the
  * reference loops one conversation in memory; here a conversation is
  * a row group and every rule is a window function, so the same audit
  * runs over a fleet's worth of session logs in one pass).
  *
  * Conversation frame contract: `conv_id, seq, role, content,
  * is_error, phase_id, is_transition_marker` (extra columns pass
  * through untouched).
  */
object ContextCompaction {

  private def bySeq = Window.partitionBy("conv_id").orderBy("seq")
  private def whole = bySeq.rowsBetween(
    Window.unboundedPreceding, Window.unboundedFollowing)

  /** `len(content) // 4` — the reference's cheap token estimate
    * (`conversation.py:467`). */
  private def est: Column =
    floor(length(coalesce(col("content"), lit(""))) / 4).cast("long")

  /** Per-conversation estimated tokens (`estimate_tokens`). */
  def estimateTokens(conv: DataFrame): DataFrame =
    conv.groupBy("conv_id").agg(sum(est).as("est_tokens"))

  /** `needs_compaction` (`conversation.py:382-383`). */
  def needsCompaction(conv: DataFrame, maxHistoryTokens: Long,
      threshold: Double): DataFrame =
    estimateTokens(conv).select(col("conv_id"),
      (col("est_tokens") >= lit(maxHistoryTokens) * lit(threshold))
        .as("needs_compaction"))

  /** The phase of the latest phase-tagged message — the reference's
    * `_current_phase` as data. */
  private def currentPhase: Column =
    last(col("phase_id"), ignoreNulls = true).over(whole)

  /** Tier 1: mark-and-placeholder old tool results
    * (`prune_old_tool_results`, `conversation.py:416-508`).
    *
    * Walking backward = a reverse-seq running sum: an eligible tool
    * result is protected while the eligible tokens after it (more
    * recent) total < `protectTokens`, pruneable once the budget is
    * crossed — the running-sum formulation is exactly the reference
    * loop because estimates are non-negative. Errors, transition
    * markers, already-pruned rows and the current phase never prune.
    * A conversation only prunes at all when it would clear
    * ≥ `minPruneTokens`. Adds `pruned`; rewrites `content` with the
    * reference's placeholder (spillover-filename preserving). */
  def pruneOldToolResults(conv: DataFrame, protectTokens: Long = 5000,
      minPruneTokens: Long = 2000): DataFrame = {
    // Every window below shares ONE ascending (conv_id, seq) sort:
    // the reference's backward walk (tokens of eligible rows MORE
    // recent than this one) is total − inclusive forward cumsum —
    // identical for unique per-conversation seq (the conversation
    // contract: seq is the message index). The direct desc-ordered
    // formulation cost a second sort, and re-deriving `eligible`
    // (whose current-phase guard is itself a window) in a later
    // stage cost two more — four sorts of the corpus for a
    // three-column verdict. The plan-shape spec pins the single sort.
    val eligible = col("role") === "tool" && !col("is_error") &&
      !startswith(coalesce(col("content"), lit("")),
        lit("[Pruned tool result")) &&
      !col("is_transition_marker") &&
      !(currentPhase.isNotNull && (col("phase_id") <=> currentPhase))
    val estEligible = when(eligible, est).otherwise(lit(0L))
    val cumInclusive = sum(estEligible).over(
      bySeq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val totalEligible = sum(estEligible).over(whole)
    val recentEst = coalesce(totalEligible - cumInclusive, lit(0L))
    val pruneable = eligible && recentEst >= protectTokens
    val clears = sum(when(pruneable, est).otherwise(lit(0L))).over(whole)
    val pruned = pruneable && clears >= minPruneTokens

    val spill = regexp_extract(coalesce(col("content"), lit("")),
      "saved to '([^']+)'", 1)
    val orig = length(coalesce(col("content"), lit(""))).cast("string")
    val placeholder = when(spill =!= "",
        concat(lit("[Pruned tool result: "), orig,
          lit(" chars. Full data in '"), spill,
          lit("'. Use load_data('"), spill, lit("') to retrieve.]")))
      .otherwise(concat(lit("[Pruned tool result: "), orig,
        lit(" chars cleared from context.]")))

    conv.withColumn("pruned", pruned)
      .withColumn("content",
        when(col("pruned"), placeholder).otherwise(col("content")))
  }

  /** `_try_extract_key` (`conversation.py:135-178`): whole-content
    * JSON, embedded JSON (first `{` … last `}`, per
    * `find_json_object`), then `key:`/`key =` line formats. The JSON
    * strategies ride Spark's lenient `get_json_object` — a bounded
    * delta from `json.loads` strictness, documented here. */
  private def extractKey(key: String): Column = {
    val q = java.util.regex.Pattern.quote(key)
    val path = s"$$['$key']"
    val emb = expr(
      "substring(content, instr(content, '{'), " +
        "length(content) - instr(content, '{') + 1)")
    def nonEmpty(c: Column) = when(trim(c) =!= "", trim(c))
    coalesce(
      get_json_object(col("content"), path),
      when(instr(col("content"), "{") > 0, get_json_object(emb, path)),
      nonEmpty(regexp_extract(col("content"),
        s"\\b$q\\s*:\\s*(.+)", 1)),
      nonEmpty(regexp_extract(col("content"),
        s"\\b$q\\s*=\\s*(.+)", 1)))
  }

  /** Tier 2: fold each conversation's old prefix into one summary row
    * (`compact`, `conversation.py:509-590` +
    * `_find_phase_graduated_split`, `:592-616`).
    *
    * `summaries` = (conv_id, summary) — the summary text itself is
    * the caller's (LLM or template); the split choice, orphaned-tool
    * advance, output-key preservation and message assembly are the
    * deterministic contract. Output = the compacted conversations:
    * one `role='user'` summary row (flagged `is_summary`) followed by
    * the kept-recent rows. (A split of 0 would pass the conversation
    * through unchanged — like the reference's `if split == 0` guard
    * it is defensive: the clamp arithmetic keeps every reachable
    * split ≥ 1.) Preserved values keep `outputKeys`
    * declaration order (the reference iterates a Python set —
    * per-run-stable but unordered; declaration order is the
    * deterministic choice, documented delta). */
  def compact(conv: DataFrame, summaries: DataFrame,
      keepRecent: Int = 2, phaseGraduated: Boolean = false,
      outputKeys: Seq[String] = Nil): DataFrame = {
    val rn = row_number().over(bySeq)
    val total = count(lit(1)).over(Window.partitionBy("conv_id"))
    val byConv = Window.partitionBy("conv_id")

    // phase-graduated split: protect the two most recently first-seen
    // phases; applies only with ≥3 phases and a current phase
    val base = conv
      .withColumn("_rn", rn)
      .withColumn("_total", total.cast("int"))
      .withColumn("_cur_phase", currentPhase)
      .withColumn("_phase_first", when(col("phase_id").isNotNull,
        min(col("_rn")).over(Window.partitionBy("conv_id", "phase_id"))))
    // distinct first-appearance positions, most recent first; the two
    // protected phases are the ones at positions 1–2 of that ranking
    val phaseStarts = sort_array(
      collect_set(col("_phase_first")).over(byConv), asc = false)
    val withPhase = base
      .withColumn("_n_phases", size(phaseStarts))
      .withColumn("_protect_from",
        when(size(phaseStarts) >= 2, element_at(phaseStarts, 2)))
    val gradSplit =
      if (!phaseGraduated) lit(null).cast("int")
      else when(col("_n_phases") >= 3 && col("_cur_phase").isNotNull,
        min(when(col("_phase_first") >= col("_protect_from"),
          col("_rn"))).over(byConv) - 1)

    // fallback split: keep_recent clamped to [0, total-1]; a clamp to
    // zero (single-message conversation) compacts everything, matching
    // the reference's falsy-after-clamp branch (conversation.py:541-543)
    val clamped = greatest(lit(0),
      least(lit(keepRecent), col("_total") - 1))
    val fallback = when(clamped > 0, col("_total") - clamped)
      .otherwise(col("_total"))
    val split0 = coalesce(gradSplit, fallback)

    // advance past orphaned tool results at the boundary
    val firstKeep = min(when(col("_rn") > col("_split0") &&
        col("role") =!= "tool", col("_rn")))
      .over(Window.partitionBy("conv_id"))
    val marked = withPhase
      .withColumn("_split0", split0)
      .withColumn("_split",
        coalesce(firstKeep - 1, col("_total").cast("int")))

    // nothing to compact → pass through whole conversations
    val untouched = marked.filter(col("_split") === 0)
    val touched = marked.filter(col("_split") > 0)

    // latest-assistant output-key values from the discarded prefix
    val withKeys = outputKeys.foldLeft(touched)((d, k) =>
      d.withColumn(s"_k_$k",
        last(when(col("role") === "assistant" &&
            col("_rn") <= col("_split"), extractKey(k)),
          ignoreNulls = true).over(whole)))

    val keptSchema = conv.columns
    val recent = withKeys.filter(col("_rn") > col("_split"))
      .withColumn("is_summary", lit(false))

    // one summary row per touched conversation
    val perConv = withKeys.groupBy("conv_id").agg(
      min(when(col("_rn") > col("_split"), col("seq"))).as("_first_keep"),
      (max(col("seq")).as("_max_seq") +:
        outputKeys.map(k => first(col(s"_k_$k")).as(s"_k_$k"))): _*)
    val preservedLines = outputKeys.map(k =>
      when(col(s"_k_$k").isNotNull,
        concat(lit(s"- $k: "), col(s"_k_$k"), lit("\n"))).otherwise(lit("")))
    val anyPreserved =
      if (outputKeys.isEmpty) lit(false)
      else outputKeys.map(k => col(s"_k_$k").isNotNull).reduce(_ || _)
    // a conversation without a summaries row still keeps its
    // preserved values — NULL summary must not null out the block
    val summaryText = coalesce(col("summary"), lit(""))
    val summaryContent = when(anyPreserved,
        concat(concat(lit("PRESERVED VALUES (do not lose these):\n") +:
          preservedLines: _*),
          lit("\nCONVERSATION SUMMARY:\n"), summaryText))
      .otherwise(summaryText)
    val summaryRows = perConv
      .join(summaries, Seq("conv_id"), "left")
      .select(
        (col("conv_id") +:
          coalesce(col("_first_keep") - 1, col("_max_seq") + 1).as("seq") +:
          lit("user").as("role") +:
          coalesce(summaryContent, lit("")).as("content") +:
          keptSchema.filterNot(Set("conv_id", "seq", "role", "content"))
            .map {
              case "is_error" => lit(false).as("is_error")
              case "is_transition_marker" =>
                lit(false).as("is_transition_marker")
              case other => lit(null).cast(
                conv.schema(other).dataType).as(other)
            }): _*)
      .withColumn("is_summary", lit(true))

    val keep = (keptSchema :+ "is_summary").map(col)
    untouched.withColumn("is_summary", lit(false)).select(keep: _*)
      .unionByName(recent.select(keep: _*))
      .unionByName(summaryRows.select(keep: _*))
  }
}
