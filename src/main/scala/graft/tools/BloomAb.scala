package graft.tools

import org.apache.spark.sql.functions._

/** A/B of parquet bloom-filter row-group pruning on point lookups over
  * an UNSORTED high-cardinality key — the case min/max statistics
  * cannot prune (every row group's [min, max] spans the key space).
  *
  * Writes one synthetic table twice — plain vs `Layout.writeWithBloom`
  * on the scattered key — then times equality lookups of ABSENT keys
  * (the crawl-join probe shape: most probes miss) min-of-N. With bloom
  * filters the reader skips row groups that definitely lack the key;
  * without, every group's key column is decoded and filtered.
  *
  * Env: SPARK_GRAFT_AB_ROWS (default 50M), SPARK_GRAFT_AB_RUNS (3).
  */
object BloomAb {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_AB_ROWS", "50000000").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_AB_RUNS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.GraftEngine
      .sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // key = md5 hex of the id → high-cardinality STRING, uniformly
    // scattered, so an unsorted layout gives every row group the full
    // [min, max] span AND the probe pays a real decode cost per
    // non-skipped group (32 bytes/row — the URL/doc-hash shape bloom
    // exists for; a cheap fixed-width long decodes faster than the
    // task overhead the skip saves). coalesce(8) keeps row groups fat.
    val df = spark.range(0, rows)
      .select(col("id"), md5(col("id").cast("string")).as("k"))
      .coalesce(8)
    val base = java.nio.file.Files.createTempDirectory("graft-bloom-ab").toString
    val plainDir = s"$base/plain"
    val bloomDir = s"$base/bloom"
    df.write.mode("overwrite").parquet(plainDir)
    // ndv per row group: ~1-2M rows/group at the default 128 MB group size
    graft.ops.Layout.writeWithBloom(df, bloomDir, Seq("k"), expectedNdv = 2000000L)

    // absent keys INSIDE the hex value range (md5 of ids beyond the
    // table) — a 'z'-prefixed probe would be min/max-pruned even
    // without bloom, which is exactly the effect this A/B isolates
    val mdd = java.security.MessageDigest.getInstance("MD5")
    val probes = (1 to 20).map { i =>
      mdd.digest(s"${rows + i}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    def time(dir: String): Double = {
      val t0 = System.nanoTime()
      val d = spark.read.parquet(dir)
      val n = probes.map(k => d.where(col("k") === k).count()).sum
      require(n == 0, s"absent probes must return nothing, got $n")
      (System.nanoTime() - t0) / 1e9
    }
    // warmup (page cache + codegen), then min-of-N each
    time(plainDir); time(bloomDir)
    val plain = (1 to runs).map(_ => time(plainDir)).min
    val bloom = (1 to runs).map(_ => time(bloomDir)).min
    def mb(p: String): Long =
      new java.io.File(p).listFiles().map(_.length()).sum / (1024 * 1024)
    println(f"[bloom-ab] rows=$rows%d probes=${probes.size}%d  " +
      f"plain ${plain}%.2f s (${mb(plainDir)}%d MB)  " +
      f"bloom ${bloom}%.2f s (${mb(bloomDir)}%d MB)  " +
      f"speedup ${plain / bloom}%.1fx")
    spark.stop()
  }
}
