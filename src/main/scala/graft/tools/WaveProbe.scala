package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway diagnostic: how many microbatches does the two-wave file
  * stage actually produce under maxFilesPerTrigger=1 + AvailableNow,
  * and what watermark does each batch run with. */
object WaveProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftEngine.sessionBuilder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val d = "/root/testdata/sf0.001"
    val ev = graft.ops.Tables.table(spark, d, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("value"))
    val e = col("ts").cast("double")
    val mm = ev.agg(min(e), max(e)).head()
    val split = mm.getDouble(0) + 0.8 * (mm.getDouble(1) - mm.getDouble(0))
    val dir = Files.createTempDirectory("probe-waves")
    def one(df: org.apache.spark.sql.DataFrame, name: String, mt: Long): Unit = {
      val tmp = Files.createTempDirectory("probe-wave").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
      Files.move(part.toPath, dir.resolve(name))
      Files.setLastModifiedTime(dir.resolve(name), FileTime.fromMillis(mt))
    }
    val t0 = System.currentTimeMillis() - 600000L
    val isLate = col("user_id") % 10 === 0
    one(ev.where(!isLate && e <= split), "wave-a.parquet", t0)
    one(ev.where(isLate || e > split), "wave-b.parquet", t0 + 60000L)
    val q = spark.readStream.format("parquet").schema(ev.schema)
      .option("maxFilesPerTrigger", 1).load(dir.toString)
      .withWatermark("ts", "3600 seconds")
      .groupBy(window(col("ts"), "3600 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("probe").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("probe-ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      val dropped = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"droppedByWatermark=$dropped watermark=${p.eventTime.get("watermark")}")
    }
    val out = spark.table("probe")
    println(s"[probe] windows=${out.count()} events=" +
      out.agg(sum(col("n"))).head().getLong(0))
    spark.stop()
  }
}
