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

  /** Same semantics as [[ngramOverlap]] via an exploded broadcast join —
    * the fallback when the eval gram SET is too large for a single
    * in-row array (tens of millions of grams) but still fits a broadcast
    * hash table. The corpus side explodes its distinct grams and
    * re-aggregates per document (map-side partial: a document's grams
    * are row-local, so the shuffle carries one row per doc); the corpus
    * is still never shuffled as documents. */
  def ngramOverlapJoin(docs: DataFrame, idCol: String, textCol: String,
                       eval: DataFrame, evalTextCol: String, n: Int = 8): DataFrame = {
    val evalGrams = eval
      .select(explode(TextOps.shingles(col(evalTextCol), n)).as("g"))
      .distinct()
      .withColumn("__hit", lit(1L))
    docs.select(col(idCol), explode(TextOps.shingles(col(textCol), n)).as("g"))
      .join(broadcast(evalGrams), Seq("g"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_grams").cast("double"))
  }

  /** Same semantics as [[ngramOverlapJoin]] for the case where even the
    * eval gram set exceeds broadcast range (cross-corpus decontamination:
    * the "eval" side is itself a corpus slice) — a genuine shuffle
    * equi-join on the gram. Gram frequency is Zipfian: a handful of
    * stopword-heavy grams carry a disproportionate share of the corpus
    * explode, so an unsalted shuffle lands those grams on single tasks.
    * The probe (corpus) side is salted via [[SkewJoin.saltedJoin]]: each
    * hot gram fans out across `saltFactor` tasks, the (distinct, smaller)
    * eval side is replicated saltFactor×. `shuffle_hash` is hinted so the
    * plan exercises the shuffle shape this variant exists for.
    *
    * Results are identical to [[ngramOverlap]]/[[ngramOverlapJoin]]
    * (proven in PipelineOpsSpec; oracle-checked as q98). */
  def ngramOverlapJoinSalted(docs: DataFrame, idCol: String, textCol: String,
                             eval: DataFrame, evalTextCol: String, n: Int = 8,
                             saltFactor: Int = 8): DataFrame = {
    val evalGrams = eval
      .select(explode(TextOps.shingles(col(evalTextCol), n)).as("__eg"))
      .distinct()
      .withColumn("__hit", lit(1L))
    val corpusGrams =
      docs.select(col(idCol), explode(TextOps.shingles(col(textCol), n)).as("g"))
    SkewJoin.saltedJoin(corpusGrams, evalGrams.hint("shuffle_hash"),
        "g", "__eg", saltFactor, "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_grams").cast("double"))
  }

  /** Streaming contamination gate: flag documents in a micro-batched
    * stream against a STATIC eval-set gram index (stream-static join —
    * the shape of an ingest-time decontamination filter; the per-row
    * gram computation is stateless, so it streams). Emits one row per
    * stream document with the same columns as [[ngramOverlap]]. */
  def contaminationFlags(stream: DataFrame, idCol: String, textCol: String,
                         eval: DataFrame, evalTextCol: String, n: Int = 8,
                         threshold: Double = 0.5): DataFrame = {
    val evalGrams = eval
      .select(explode(TextOps.shingles(col(evalTextCol), n)).as("g"))
      .agg(collect_set(col("g")).as("eval_grams"))
    stream.select(col(idCol), TextOps.shingles(col(textCol), n).as("__sh"))
      .crossJoin(broadcast(evalGrams))
      .select(col(idCol),
        size(col("__sh")).cast("long").as("n_grams"),
        size(array_intersect(col("__sh"), col("eval_grams"))).cast("long")
          .as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_grams").cast("double"))
      .withColumn("is_contaminated", col("contamination") >= threshold)
  }
}
