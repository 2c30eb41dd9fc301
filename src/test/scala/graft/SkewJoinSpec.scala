package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.{SkewJoin, Tables}
import graft.streaming.StreamOps

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join under skew") {
    // 90% of probe rows share one hot key
    val probe = (1 to 2000).map(i =>
      (i.toLong, if (i % 10 == 0) i.toLong % 7 else 42L)).toDF("row_id", "k")
    val build = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (6L, "f")).toDF("bk", "v")
    val plain = probe.join(build, col("k") === col("bk"))
      .select("row_id", "v").as[(Long, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(probe, build, "k", "bk", saltFactor = 8)
      .select("row_id", "v").as[(Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._2 == "hot") == 1800)
  }

  test("salting measurably bounds the hot-key shuffle partition") {
    // 90% of 20k probe rows share one hot key: an unsalted shuffle on k
    // lands them all in ONE task. Measure the actual max partition size
    // under hash partitioning on k vs on (salt, k) — the distribution a
    // shuffled join gives each side.
    val probe = (1 to 20000).map(i =>
      (i.toLong, if (i % 10 == 0) i.toLong % 7 else 42L)).toDF("row_id", "k")
    // 256 partitions so the 8 salted hot-key groups rarely collide into
    // one partition (at 32, balls-into-bins collisions blur the measure)
    def maxPartitionRows(df: org.apache.spark.sql.DataFrame, keys: Seq[String]) =
      df.repartition(256, keys.map(col): _*)
        .rdd.mapPartitions(it => Iterator(it.size)).collect().max
    val unsalted = maxPartitionRows(probe, Seq("k"))
    val salted = maxPartitionRows(SkewJoin.saltProbe(probe, 8), Seq("__salt", "k"))
    info(s"max partition rows: unsalted=$unsalted salted=$salted")
    assert(unsalted >= 18000, s"hot key must dominate one partition: $unsalted")
    assert(salted <= unsalted / 4,
      s"saltFactor=8 must spread the hot key: max $salted vs $unsalted")
  }

  test("stream-stream interval join matches events within the window") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val clicks = MemoryStream[(Long, Timestamp)](30, spark, None)
    val buys = MemoryStream[(Long, Timestamp)](31, spark, None)
    val joined = StreamOps.streamStreamJoin(
      clicks.toDF().toDF("c_user", "c_ts"),
      buys.toDF().toDF("b_user", "b_ts"),
      "c_user", "b_user", "c_ts", "b_ts",
      watermark = "1 hour", before = "0 minutes", after = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append()).start()
    clicks.addData((1L, ts(0)), (2L, ts(0)))
    buys.addData((1L, ts(10)), (2L, ts(50)), (1L, ts(25)))
    q.processAllAvailable(); q.stop()
    // user 1: buys at +10 and +25 within 30min → 2 matches; user 2: +50 → none
    val rows = spark.table("ssj").select("c_user", "b_ts")
      .as[(Long, Timestamp)].collect()
    assert(rows.count(_._1 == 1L) == 2)
    assert(!rows.exists(_._1 == 2L))
  }
}
