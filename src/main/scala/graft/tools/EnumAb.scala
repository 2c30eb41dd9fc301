package graft.tools

/** Same-JVM interleaved A/B harness for conf triage: runs one headline
  * query at a fixed scale dir under alternating values of a session
  * conf, reporting per-round times and per-value minima. Same-JVM
  * interleaving controls for the page-cache/JIT drift that makes
  * cross-run comparisons on this box ±30-40% at x100 sizes.
  *
  * Round-5 use: isolate whether the grouped collect_list candidate
  * enumeration's ObjectHashAggregate falls back to sort-based
  * aggregation at x100 bucket counts (>65536 groups per task).
  */
object EnumAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_AB_DIR", "/tmp/graft-scale/x100")
    val qname = sys.env.getOrElse("SPARK_GRAFT_AB_QUERY", "q35")
    val confKey = sys.env.getOrElse("SPARK_GRAFT_AB_CONF",
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    val values = sys.env.getOrElse("SPARK_GRAFT_AB_VALUES", "65536,4194304")
      .split(",").map(_.trim)
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "3").toInt
    val spark = graft.engine.GraftEngine
      .sessionBuilder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.queries.Catalog.entries
      .find(_._1.startsWith(qname)).getOrElse(sys.error(s"no query $qname"))._2
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); dt
    }
    spark.conf.set(confKey, values.head)
    println(f"[ab] warmup ${once()}%7.2f s  ($qname @ $dir)")
    val results = for (r <- 1 to rounds; v <- values) yield {
      spark.conf.set(confKey, v)
      val dt = once()
      println(f"[ab] round $r $confKey=$v%-9s $dt%7.2f s")
      (v, dt)
    }
    values.foreach { v =>
      val min = results.collect { case (`v`, dt) => dt }.min
      println(f"[ab] MIN $confKey=$v%-9s $min%7.2f s")
    }
    spark.stop()
  }
}
