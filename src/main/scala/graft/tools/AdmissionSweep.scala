package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.connector.{FileTopicSource, TopicSink, TopicSource}
import graft.model.ConsumerConfig

/** Measured admission-control (backpressure) sweep for the relay — the
  * evidence behind SURVEY §2a #10: the reference bounds what one poll
  * admits (its buffer/batch-size knobs); the Spark relay's equivalent
  * is the per-trigger admission cap (`maxFilesPerTrigger` via
  * `ConsumerConfig.maxBatchSize`). This main stages the events fixture
  * across a fixed file envelope, then replays the SAME backlog under a
  * range of caps and prints, per cap: the microbatch count, total
  * catch-up wall, throughput, and the per-microbatch admitted-row
  * bound. What the knob trades at 100 TB: small caps bound per-batch
  * state/memory (each microbatch is a bounded unit of work and a WAL
  * commit point) at the price of per-trigger overhead; large caps
  * amortize the overhead but admit bigger units the executors must
  * absorb at once. min-of-2 per cap; exactly-once asserted by the
  * delivered count each run.
  *
  * Run: `runMain graft.tools.AdmissionSweep` (env SPARK_GRAFT_SF_DIR,
  * default sf0.1; SPARK_GRAFT_FILES, default 48).
  */
object AdmissionSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_FILES", "48").toInt
    val spark = graft.engine.GraftEngine
      .sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stageDir = java.nio.file.Files
      .createTempDirectory("graft-admission-stage").toString
    val events = graft.ops.Tables.table(spark, sfDir, "events")
    events.select(
        to_json(struct(col("event_id"), col("user_id"),
          col("event_type"), col("value"))).cast("binary").as("data"),
        col("user_id").cast("string").as("partitionKey"),
        col("event_id").as("seq"))
      .repartition(nFiles).write.mode("overwrite").parquet(stageDir)
    val n = events.count()
    val envSchema = StructType(Seq(
      StructField("data", BinaryType), StructField("partitionKey", StringType),
      StructField("seq", LongType)))
    val payloadSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))

    println(s"# admission sweep: $n rows staged across $nFiles files ($sfDir)")
    println("| cap (files/trigger) | microbatches | max rows/batch | catch-up s (min of 2) | rows/s |")
    println("|---|---|---|---|---|")
    for (cap <- Seq(1, 4, 8, 16, 48)) {
      val runs = (1 to 2).map { _ =>
        TopicSink.CountingSender.reset()
        val batches = new java.util.concurrent.atomic.AtomicLong(0L)
        val maxRows = new java.util.concurrent.atomic.AtomicLong(0L)
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-admission-ckpt").toString
        val src = FileTopicSource("admission-sweep", stageDir, "parquet",
          envSchema, ConsumerConfig(None, maxBatchSize = cap))
        val t0 = System.nanoTime()
        val q = src.load(spark).writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: DataFrame, _: Long) =>
            val decoded = TopicSource.decodeJson(b, payloadSchema)
            val flowed = decoded.select(col("payload.*"), col("seq"))
            val env = TopicSource.encodeJsonOrdered(flowed, "seq",
              Some("user_id"))
            val sent = TopicSink.CountingSender.records.get()
            TopicSink.writeOrdered(env, "seq",
              () => new TopicSink.CountingSender, cpus.toInt)
            batches.incrementAndGet()
            val got = TopicSink.CountingSender.records.get() - sent
            maxRows.getAndUpdate(m => math.max(m, got))
            ()
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val dt = (System.nanoTime() - t0) / 1e9
        require(TopicSink.CountingSender.records.get() == n,
          s"relay lost records under cap=$cap: " +
            s"${TopicSink.CountingSender.records.get()} of $n")
        (dt, batches.get(), maxRows.get())
      }
      val best = runs.minBy(_._1)
      println(f"| $cap | ${best._2} | ${best._3} | ${best._1}%.2f | ${(n / best._1).toLong} |")
    }
    spark.stop()
  }
}
