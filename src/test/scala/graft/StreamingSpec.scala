package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("windowed event counts aggregate within watermarked windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val events = in.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = StreamingOps.windowedEventCounts(events, "10 minutes", "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("wec").outputMode("update").start()
    try {
      in.addData((1L, ts(0), "click", 1.0), (2L, ts(1), "click", 2.0), (3L, ts(2), "view", 5.0))
      q.processAllAvailable()
      val byType = spark.table("wec").groupBy("event_type").agg(max("n").as("n"))
        .as[(String, Long)].collect().toMap
      assert(byType("click") == 2 && byType("view") == 1)
    } finally q.stop()
  }

  test("streaming dedup drops repeated normalized text within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.streamingDedup(docs, "1 hour")
      .writeStream.format("memory").queryName("sdd").outputMode("append").start()
    try {
      in.addData((1L, ts(0), "Hello, World"), (2L, ts(1), "hello world!"), (3L, ts(2), "other"))
      q.processAllAvailable()
      val ids = spark.table("sdd").select("doc_id").as[Long].collect().toSet
      assert(ids.size == 2)              // the case/punct variant was deduped
      assert(ids.contains(3L))
      assert(ids.intersect(Set(1L, 2L)).size == 1)
    } finally q.stop()
  }

  test("conversation state accumulates turn counts per conv") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingOps.Turn]
    val q = StreamingOps.conversationState(in.toDS(), timeoutMs = 0)
      .writeStream.format("memory").queryName("cstate").outputMode("append").start()
    try {
      in.addData(StreamingOps.Turn("c1", 0, "hi", 1000L), StreamingOps.Turn("c1", 1, "yo", 2000L),
        StreamingOps.Turn("c2", 0, "hey", 1500L))
      q.processAllAvailable()
      in.addData(StreamingOps.Turn("c1", 2, "more", 3000L))
      q.processAllAvailable()
      val rows = spark.table("cstate")
        .select("conv_id", "turns", "closed").as[(String, Int, Boolean)].collect()
      val c1 = rows.filter(_._1 == "c1").map(_._2).max
      assert(c1 == 3)
      assert(rows.filter(_._1 == "c2").map(_._2).max == 1)
      assert(rows.forall(!_._3))         // no timeout fired in-test
    } finally q.stop()
  }
}
