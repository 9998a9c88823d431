package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, if (i % 3 == 0) "fr" else "en"))
      .toDF("doc_id", "lang")

  test("assignSplits: cumulative bounds, ~80/10/10, validates input") {
    val got = Sampling.assignSplits(docs(1000), col("doc_id"),
      Seq("train" -> 80, "val" -> 90, "test" -> 100))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.sum === 1000L)
    assert(got("train") > 700 && got("train") < 900) // hash-binomial
    assert(got("val") > 40 && got("test") > 40)
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs(10), col("doc_id"), Seq("train" -> 80))
    }
    intercept[IllegalArgumentException] { // unreachable middle split
      Sampling.assignSplits(docs(10), col("doc_id"),
        Seq("train" -> 90, "val" -> 80, "test" -> 100))
    }
  }

  test("assignSplits: growth-stable — existing rows never move split " +
      "when the corpus doubles (the rand() failure mode)") {
    val before = Sampling.assignSplits(docs(500), col("doc_id"),
      Seq("train" -> 80, "test" -> 100))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val after = Sampling.assignSplits(docs(1000), col("doc_id"),
      Seq("train" -> 80, "test" -> 100))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    for ((id, s) <- before) assert(after(id) === s, id)
  }

  test("contamination: held-out rows whose content hash exists in train") {
    val d = Seq(
      (1L, "en", "shared text"), (2L, "en", "shared text"),
      (3L, "en", "unique a"), (4L, "en", "unique b"),
      (5L, "en", "also shared"), (6L, "en", "also shared"),
      (7L, "en", "also shared"))
      .toDF("doc_id", "lang", "text")
    // force a known split rather than depending on hash luck
    val assigned = d.withColumn("split",
      when(col("doc_id") % 2 === 0, "test").otherwise("train"))
    val got = Sampling.contamination(assigned, col("text"))
      .select("doc_id", "n_train_dups").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // test docs 2 and 6 share text with train docs (1) and (5, 7)
    assert(got === Map(2L -> 1L, 6L -> 2L))
  }

  test("packSequences: concat-packing offsets, straddling doc starts " +
      "in its sequence of origin") {
    import spark.implicits._
    // one shard (ids ≡ 0 mod 1): tokens 100, 950, 1200 → starts at
    // 0, 100, 1050; capacity 1024 ⇒ doc 3 starts in seq 1 at offset
    // 26 even though doc 2 straddles the boundary
    val d = Seq((1L, 100L), (2L, 950L), (3L, 1200L))
      .toDF("doc_id", "n_tokens")
    val got = Sampling.packSequences(d, col("doc_id"), col("n_tokens"),
      shards = 1, capacity = 1024L)
      .select("doc_id", "start_pos", "seq_index", "seq_offset")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((0L, 0L, 0L)),
      2L -> ((100L, 0L, 100L)),
      3L -> ((1050L, 1L, 26L))))
  }

  test("stratifiedSample: exact ceil(frac·n) per stratum, deterministic") {
    val d = docs(100) // 33 fr, 67 en
    val got = Sampling.stratifiedSample(d, col("doc_id"), col("lang"), 0.2)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("en" -> 14L, "fr" -> 7L)) // ceil(.2·67), ceil(.2·33)
    val a = Sampling.stratifiedSample(d, col("doc_id"), col("lang"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.stratifiedSample(d, col("doc_id"), col("lang"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq)
  }
}
