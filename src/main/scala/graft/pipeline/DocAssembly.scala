package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions._

/** Per-conversation document assembly with stable turn ordering.
  *
  * Reference analog: Query construction (nordlys/erd/query/query.py:15-40)
  * — one logical "query" per conversation. The per-row invariant
  * (BASELINE.json): per-turn text must survive byte-identical under stable
  * `(conv_id, turn_idx)` ordering; `explodeBack` reverses the assembly for
  * the invariant test.
  *
  * Scale notes: a single `groupBy(conv_id)` — one shuffle, map-side partial
  * aggregation applies to `collect_list`, conversations are bounded-length
  * so no key is hot. `array_sort` on the collected structs (sorting by the
  * leading `turn_idx` field) makes ordering independent of partition/task
  * arrival order — never rely on `sortWithinPartitions` feeding
  * `collect_list`, AQE may re-split it.
  */
object DocAssembly {

  /** transcripts(conv_id, turn_idx, role, text, tool, ts) →
    * docs(conv_id, turns, doc_text, norm_text, tokens, n_turns)
    */
  def assemble(transcripts: DataFrame): DataFrame = {
    val sorted = array_sort(collect_list(struct(col("turn_idx"), col("text"))))
    transcripts
      .groupBy(col("conv_id"))
      .agg(sorted.as("turns"))
      .select(
        col("conv_id"),
        col("turns"),
        concat_ws(" ", transform(col("turns"), t => t("text"))).as("doc_text"),
        size(col("turns")).as("n_turns"))
      .withColumn("norm_text", norm_text(col("doc_text")))
      .withColumn("tokens", tokens(col("doc_text")))
  }

  /** Inverse of assemble for the per-row invariant check:
    * (conv_id, turn_idx, text) rows recovered from the assembled docs.
    */
  def explodeBack(docs: DataFrame): DataFrame =
    docs.select(col("conv_id"), explode(col("turns")).as("t"))
      .select(col("conv_id"), col("t.turn_idx").as("turn_idx"), col("t.text").as("text"))
}
