package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.StreamOps

/** True-streaming semantics: watermarked windows, streaming dedup,
  * stateful processing, stream-static join — driven through MemoryStream
  * microbatches (not batch equivalents). */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  case class Ev(ts: Timestamp, user_id: Long, event_id: Long, value: Double)

  test("tumbling window with watermark aggregates per window and key") {
    val input = MemoryStream[Ev](10, spark, None)
    val agg = StreamOps.tumblingCounts(
      input.toDF().withColumn("key", col("user_id").cast("string")),
      "ts", "key", "10 minutes", "30 minutes")
    input.addData(Ev(ts(1), 1, 1, 2.0), Ev(ts(5), 1, 2, 3.0), Ev(ts(12), 1, 3, 4.0))
    val q = agg.writeStream.format("memory").queryName("tumb")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("tumb").orderBy("w_start")
      .select("n", "sum_value").as[(Long, Double)].collect()
    assert(rows.toSeq == Seq((2L, 5.0), (1L, 4.0)))
  }

  test("streaming dedup drops re-delivered event ids (effective-once)") {
    val input = MemoryStream[Ev](11, spark, None)
    val q = StreamOps.dedupped(input.toDF(), "ts", "event_id", "1 hour")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    input.addData(Ev(ts(1), 1, 100, 1.0), Ev(ts(2), 1, 101, 1.0))
    q.processAllAvailable()
    // simulate at-least-once redelivery of event 100 in a later batch
    input.addData(Ev(ts(1), 1, 100, 1.0), Ev(ts(3), 1, 102, 1.0))
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(100L, 101L, 102L))
  }

  test("mapGroupsWithState accumulates per-user running state across batches") {
    val input = MemoryStream[(Long, Double)](12, spark, None)
    val q = StreamOps.runningUserState(spark, input.toDS())
      .writeStream.format("memory").queryName("state")
      .outputMode(OutputMode.Update()).start()
    input.addData((1L, 1.0), (1L, 2.0), (2L, 10.0))
    q.processAllAvailable()
    input.addData((1L, 4.0))
    q.processAllAvailable(); q.stop()
    val byUser = spark.table("state")
      .groupBy("userId").agg(max("nEvents").as("n"), max("totalValue").as("v"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byUser(1L) == ((3L, 7.0)))
    assert(byUser(2L) == ((1L, 10.0)))
  }

  test("stream-static join enriches a stream against a dimension table") {
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("id", "tier")
    val input = MemoryStream[Ev](13, spark, None)
    val q = StreamOps.enrich(input.toDF(), dim, "user_id", "id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    input.addData(Ev(ts(1), 1, 1, 1.0), Ev(ts(2), 3, 2, 1.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("enriched").select("event_id", "tier")
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("gold"))
    assert(out(2L).isEmpty, "unmatched stream row keeps null from left_outer")
  }

  test("watermark drops events that arrive later than the allowed lateness") {
    val input = MemoryStream[Ev](15, spark, None)
    // Append mode: windows emit only once the watermark passes their end,
    // so late data either merges (within lateness) or is dropped.
    input.addData(Ev(ts(1), 1, 1, 1.0), Ev(ts(2), 1, 2, 1.0))
    val q = StreamOps.tumblingCounts(
        input.toDF().withColumn("key", col("user_id").cast("string")),
        "ts", "key", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("late")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // advance the watermark far past the first window...
    input.addData(Ev(Timestamp.valueOf("2024-01-01 12:00:00"), 1, 3, 1.0))
    q.processAllAvailable()
    // ...then send an event for the long-closed first window: must be dropped
    input.addData(Ev(ts(3), 1, 4, 99.0))
    q.processAllAvailable()
    input.addData(Ev(Timestamp.valueOf("2024-01-01 14:00:00"), 1, 5, 1.0))
    q.processAllAvailable(); q.stop()
    val firstWindow = spark.table("late")
      .where(col("w_start") === ts(0)).select("n").as[Long].collect()
    assert(firstWindow.toSeq == Seq(2L), "late event must not reopen the closed window")
  }

  test("session window groups events by gap") {
    val input = MemoryStream[Ev](14, spark, None)
    // session windows only support Append mode on streams: sessions are
    // emitted once the watermark passes their end, so a later flush batch
    // advances the watermark past both sessions
    input.addData(Ev(ts(1), 1, 1, 1.0), Ev(ts(5), 1, 2, 1.0), Ev(ts(30), 1, 3, 1.0))
    val q = StreamOps.sessionCounts(input.toDF(), "ts", "user_id", "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    input.addData(Ev(Timestamp.valueOf("2024-01-01 13:00:00"), 9, 99, 1.0))
    q.processAllAvailable(); q.stop()
    val ns = spark.table("sess").orderBy("s_start").select("n").as[Long].collect()
    assert(ns.toSeq == Seq(2L, 1L))
  }
}
