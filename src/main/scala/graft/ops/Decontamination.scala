package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that overlap an
  * evaluation set by shared word n-grams, the standard contamination
  * check run before LLM training (n=8..13 word grams in published
  * pipelines).
  *
  * Scale design: the eval set is small (benchmarks are thousands of
  * documents, the corpus is billions), so its distinct gram set is
  * aggregated once and BROADCAST; each training document then computes
  * its overlap with a per-row `array_intersect` against the broadcast
  * array — one pass over the corpus, no shuffle of corpus data at all.
  * For eval-gram sets too large to broadcast as an array, the same
  * semantics fall back to a broadcast semi-join on exploded grams
  * (still never shuffling the corpus side).
  *
  * Determinism: counts are integers and the contamination fraction is a
  * single exact division — bit-reproducible across engines.
  */
object Decontamination {

  /** Per-document contamination against `eval`: (idCol, n_grams,
    * n_contaminated, contamination = n_contaminated / n_grams).
    * A document whose text is shorter than n words contributes its one
    * truncated gram (mirroring [[TextOps.shingles]] semantics). */
  def ngramOverlap(docs: DataFrame, idCol: String, textCol: String,
                   eval: DataFrame, evalTextCol: String, n: Int = 8): DataFrame = {
    val sh = TextOps.shingles(col(textCol), n)
    val evalGrams = eval
      .select(explode(TextOps.shingles(col(evalTextCol), n)).as("g"))
      .agg(collect_set(col("g")).as("eval_grams"))
    docs.select(col(idCol), sh.as("__sh"))
      .crossJoin(broadcast(evalGrams))
      .select(col(idCol),
        size(col("__sh")).cast("long").as("n_grams"),
        size(array_intersect(col("__sh"), col("eval_grams"))).cast("long")
          .as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_grams").cast("double"))
  }
}
