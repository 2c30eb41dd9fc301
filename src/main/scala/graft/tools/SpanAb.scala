package graft.tools

/** Same-JVM interleaved A/B of the span miners' gram-stream strategy:
  * materialize=true (checkpoint-truncate the slim gram frame once, both
  * branches read blocks) vs materialize=false (recompute the compiled
  * explode on the mark side). Round 7 uses this to DECIDE the default
  * with measurements instead of the plan-shape argument. */
object SpanAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_AB_DIR", "/tmp/graft-scale/x10")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "3").toInt
    val winnow = sys.env.get("SPARK_GRAFT_AB_WINNOW").exists(_ == "1")
    val spark = graft.engine.GraftEngine
      .sessionBuilder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.ops.Tables.table(spark, dir, "documents")
    def once(mat: Boolean): Double = {
      val t0 = System.nanoTime()
      val out =
        if (winnow) graft.ops.Dedup.duplicatedSpansWinnowed(
          docs, "doc_id", "text", spanLen = 30, window = 8, materialize = mat)
        else graft.ops.Dedup.duplicatedSpans(
          docs, "doc_id", "text", spanLen = 30, materialize = mat)
      out.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); dt
    }
    println(f"[ab] warmup ${once(false)}%7.2f s (winnow=$winnow @ $dir)")
    val results = for (r <- 1 to rounds; mat <- Seq(true, false)) yield {
      val dt = once(mat)
      println(f"[ab] round $r materialize=$mat%-5s $dt%7.2f s")
      (mat, dt)
    }
    Seq(true, false).foreach { mat =>
      val min = results.collect { case (`mat`, dt) => dt }.min
      println(f"[ab] MIN materialize=$mat%-5s $min%7.2f s")
    }
    spark.stop()
  }
}
