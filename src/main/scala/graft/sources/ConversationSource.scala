package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conversation-store reader (SURVEY §1.1 Message row; reference
  * `graph/conversation.py:12-127`, seq-numbered JSON parts + a cursor
  * doc written through on every message).
  *
  * Analytics surface: the ordered message log per conversation, the
  * spillover pointers embedded in truncated tool results
  * (`conversation.py:92-105`), and the cursor's accumulated outputs
  * (`event_loop_node.py:129-161` write-through restore path).
  */
object ConversationSource {

  val messageSchema: StructType = StructType(Seq(
    StructField("seq", LongType),
    StructField("role", StringType),
    StructField("content", StringType),
    StructField("tool_calls", ArrayType(StringType)),
    StructField("tool_call_id", StringType),
    StructField("is_error", BooleanType),
    StructField("phase_id", StringType),
    StructField("is_transition_marker", BooleanType),
    StructField("is_client_input", BooleanType)))

  /** All parts under `root` (glob `<prefix>part-*.json`), ordered by
    * seq, with the conversation id derived from the directory. */
  def messages(spark: SparkSession, root: String): DataFrame =
    spark.read
      .schema(messageSchema)
      .option("mode", "DROPMALFORMED")
      .json(s"$root/*/part-*.json")
      .withColumn("conversation_id",
        regexp_extract(input_file_name(), "([^/]+)/part-[^/]*$", 1))
      .orderBy("conversation_id", "seq")

  /** Spillover pointers: tool-result messages whose content references
    * a spilled file — `"saved to '<name>'"`
    * (`conversation.py:92-105`; producer `event_loop_node.py:2167+`). */
  def spilloverPointers(messages: DataFrame): DataFrame =
    messages
      .withColumn("spillover_file",
        nullif(regexp_extract(col("content"), "saved to '([^']+)'", 1),
          lit("")))
      .filter(col("spillover_file").isNotNull)
      .select("conversation_id", "seq", "spillover_file")

  /** Cursor docs (`cursor.json` per conversation): next_seq, iteration
    * and the accumulated output map — the crash-restore source. */
  def cursors(spark: SparkSession, root: String): DataFrame =
    spark.read
      .schema(StructType(Seq(
        StructField("next_seq", LongType),
        StructField("iteration", LongType),
        StructField("outputs", MapType(StringType, StringType)))))
      .option("mode", "DROPMALFORMED")
      .json(s"$root/*/cursor.json")
      .withColumn("conversation_id",
        regexp_extract(input_file_name(), "([^/]+)/cursor\\.json$", 1))
}
