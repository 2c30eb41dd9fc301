package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Measured cost/recall curve for [[Dedup.duplicatedSpans]]'
  * content-defined sampling dial (`sampleMod`) — the evidence behind
  * retiring q99's stride-1 scale envelope: at mod p only grams whose
  * h1 ≡ 0 (mod p) enter the shuffle, so the exchanged bytes drop ~p×
  * while detection stays alignment-robust (the keep decision is a
  * function of the gram hash, shared by every copy). This main runs
  * the q99 shape (spanLen 30) at mod 1/4/16 over the ScalingCurve
  * expansion dirs (x1/x10/x100 of the sf0.1 documents fixture; falls
  * back to the base fixture alone when the expansion dirs are absent)
  * and prints wall seconds plus the recall side of the trade: interval
  * count and total covered chars vs the stride-1 truth.
  *
  * Run: `runMain graft.tools.SpanSampleSweep` after
  * `runMain graft.tools.ScalingCurve` has staged /tmp/graft-scale.
  */
object SpanSampleSweep {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val workDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft-scale")
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftEngine
      .sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dirs = Seq(1, 10, 100)
      .map(f => (s"x$f", s"$workDir/x$f"))
      .filter { case (_, p) =>
        new java.io.File(s"$p/documents.parquet/_SUCCESS").exists() }
    val targets = if (dirs.nonEmpty) dirs else Seq(("base", baseDir))

    println("| corpus | sampleMod | wall (s) | intervals | covered chars |")
    for ((label, dir) <- targets; p <- Seq(1, 4, 16)) {
      val docs = graft.ops.Tables.table(spark, dir, "documents")
      val t0 = System.nanoTime()
      val agg = Dedup.duplicatedSpans(docs, "doc_id", "text", spanLen = 30,
          sampleMod = p)
        .agg(count(lit(1)).as("n"), sum("span_chars").as("chars"))
        .head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"| $label | $p | $dt%.2f | ${agg.getLong(0)} | ${agg.getLong(1)} |")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
