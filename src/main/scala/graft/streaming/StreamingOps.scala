package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions._

/** Structured Streaming surface. The reference is pure batch (SURVEY.md
  * §2.10), so this module is *additive* capability for the training-data
  * pipeline: the same per-row operators (normalization, hashing, quality)
  * applied to unbounded inputs, plus the three standard stateful shapes —
  * watermarked windowed aggregation, watermarked streaming dedup, and
  * custom session state via flatMapGroupsWithState.
  *
  * All transforms take/return streaming DataFrames (`readStream` →
  * transform → `writeStream` composes outside); nothing here binds to a
  * specific source or sink.
  */
object StreamingOps {

  /** Sliding-window event counts with a watermark bounding state. */
  def windowedEventCounts(events: DataFrame, windowDur: String = "10 minutes",
                          slide: String = "5 minutes",
                          watermark: String = "30 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  /** Streaming exact dedup on the normalized-text hash; watermark lets the
    * dedup state age out (dropDuplicatesWithinWatermark — without it the
    * seen-set grows forever on an unbounded stream).
    */
  def streamingDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("text_hash", xxhash64(norm_text(col("text"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  case class Turn(conv_id: String, turn_idx: Int, text: String, ts_ms: Long)
  case class ConvState(turns: Int, lastTs: Long)
  case class ConvUpdate(conv_id: String, turns: Int, closed: Boolean)

  /** Custom conversation state: count turns per conv_id, emitting an update
    * per batch (the streaming analog of per-conversation document
    * assembly). With `timeoutMs > 0`, idle conversations emit a closing
    * update when the processing-time timeout fires and their state is
    * dropped (bounded state); `timeoutMs = 0` keeps state forever (useful
    * for deterministic tests — timeout-driven batches make
    * `processAllAvailable` unsuitable in-process).
    */
  def conversationState(turns: Dataset[Turn], timeoutMs: Long = 60000): Dataset[ConvUpdate] = {
    import turns.sparkSession.implicits._
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, ConvUpdate](OutputMode.Append(), timeoutConf) {
        case (convId, rows, state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ConvUpdate(convId, s.turns, closed = true))
          } else {
            val prev = state.getOption.getOrElse(ConvState(0, 0L))
            val buf = rows.toSeq
            val next = ConvState(prev.turns + buf.size,
              math.max(prev.lastTs, if (buf.isEmpty) 0L else buf.map(_.ts_ms).max))
            state.update(next)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            Iterator.single(ConvUpdate(convId, next.turns, closed = false))
          }
      }
  }
}
