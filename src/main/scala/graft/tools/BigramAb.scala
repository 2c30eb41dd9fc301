package graft.tools

/** Same-JVM interleaved A/B of q118's tokenize strategy: the round-7
  * verdict flagged the bigram-LM plan's three independent tokenize
  * subtrees (bigram stream, bigram counts, unigram counts — each a
  * full-corpus regex split) and asked for a measurement, not an
  * assumption, of materializing the token stream once
  * (`bigramSurprisal(materialize = true)`: one checkpoint-truncated
  * (id, tokens) frame feeding all three consumers) — the same question
  * `SpanAb` settled for the span miners. Run at x10/x100; min-of-N
  * per branch, interleaved so load drift hits both. */
object BigramAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_AB_DIR", "/tmp/graft-scale/x10")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "3").toInt
    val spark = graft.engine.GraftEngine
      .sessionBuilder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.ops.Tables.table(spark, dir, "documents")
    def once(mat: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.ops.TextOps.bigramSurprisal(docs, "doc_id", "text", materialize = mat)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); dt
    }
    println(f"[ab] warmup ${once(false)}%7.2f s (@ $dir)")
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
