package graft.tools

import org.apache.spark.sql.functions._

/** Measured curve for the COMPILED BPE encoder at a production-depth
  * merge table (~1k merges) vs the literal replace chain — the round-8
  * verdict's top ask: the chain is one expression node + one full
  * string pass PER MERGE, so its production contract (32k merges) is a
  * codegen blowup by construction; the compiled node
  * ([[graft.functions.BpeEncodeMerges]]) holds the whole rank table in
  * one reference object.
  *
  * The synthetic fixture draws words from a small fixed list, so plain
  * learning exhausts after ~90 merges at any corpus scale; the tool
  * therefore derives a compound corpus (adjacent token pairs joined by
  * '_' — squares the vocabulary deterministically) and learns a ~1k
  * table on the x1 leg via the vocab-first trainer
  * ([[graft.ops.TextOps.bpeLearnFromVocab]]), then times, per scale
  * leg, interleaved min-of-N:
  *
  *   - compiled @ full table (~1k merges)
  *   - compiled @ 8 merges   (table-size sensitivity of the node)
  *   - chain    @ 8 merges   (the q116 oracle shape)
  *   - chain    @ 64 merges  (the chain's per-merge slope)
  *
  * Run after ScalingCurve has expanded /tmp/graft-scale (reuses its
  * corpora); results recorded in SCALING.md. */
object BpeAb {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_AB_DIRS",
      "/tmp/graft-scale/x1,/tmp/graft-scale/x10,/tmp/graft-scale/x100")
      .split(",").map(_.trim).toSeq
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "3").toInt
    val tableRounds = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "1000").toInt
    val spark = graft.engine.GraftEngine
      .sessionBuilder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.TextOps

    // compound derivation: adjacent token pairs joined by '_' (pure
    // column expressions, row-local). ceil(n/2) groups; the last group
    // of an odd-length doc is the lone final token.
    def derived(dir: String) = {
      val docs = graft.ops.Tables.table(spark, dir, "documents")
        .where(length(trim(col("text"))) > 0)
      val ts = split(trim(lower(col("text"))), "\\s+")
      docs.select(col("doc_id"),
        concat_ws(" ",
          transform(sequence(lit(1), floor((size(ts) + 1) / 2).cast("int")),
            i => concat_ws("_", slice(ts, i * 2 - 1, lit(2))))).as("text"))
    }

    // learn ONCE on the x1 leg: one distributed wordcount, then the
    // driver-side vocab merge loop (rounds are inherently sequential)
    val t0 = System.nanoTime()
    val vocab = TextOps.wordCounts(derived(dirs.head), "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = TextOps.bpeLearnFromVocab(vocab, tableRounds)
    println(f"[ab] learned ${merges.size} merges from ${vocab.size} vocab words " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val variants: Seq[(String, Seq[(String, String)], Boolean)] = Seq(
      (s"compiled@${merges.size}", merges, true),
      ("compiled@8", merges.take(8), true),
      ("chain@8", merges.take(8), false),
      ("chain@64", merges.take(64), false))

    dirs.foreach { dir =>
      val docs = derived(dir)
      def once(m: Seq[(String, String)], compiled: Boolean): Double = {
        val cnt =
          if (compiled) TextOps.bpeTokenCountCompiled(col("text"), m)
          else TextOps.bpeTokenCount(col("text"), m)
        val t = System.nanoTime()
        docs.select(col("doc_id"), cnt.as("n"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      once(merges.take(8), compiled = true) // warmup (JIT + codegen)
      val results = for (r <- 1 to rounds; (name, m, c) <- variants) yield {
        val dt = once(m, c)
        println(f"[ab] $dir round $r $name%-14s $dt%7.2f s")
        (name, dt)
      }
      variants.foreach { case (name, _, _) =>
        val min = results.collect { case (`name`, dt) => dt }.min
        println(f"[ab] $dir MIN $name%-14s $min%7.2f s")
      }
    }
    spark.stop()
  }
}
