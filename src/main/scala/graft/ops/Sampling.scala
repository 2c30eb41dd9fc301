package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * `df.randomSplit` is seed-dependent on partitioning — re-running after a
  * repartition reassigns rows. These operators derive the assignment from
  * a hash of a stable id, so membership is a pure function of the row:
  * reproducible across runs, partitionings, and engines, and a document
  * can never land in both train and test. No shuffle — the bucket is a
  * per-row expression evaluated inside the scan's codegen stage.
  */
object Sampling {

  private val Buckets = 1000000

  /** Stable bucket in [0, 1) for a row id. */
  def hashFraction(id: Column): Column =
    pmod(xxhash64(id), lit(Buckets)).cast("double") / Buckets

  /** Keep a deterministic `fraction` of rows by id hash. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.where(hashFraction(col(idCol)) < fraction)

  /** Disjoint, exhaustive named splits, e.g.
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1). Adds a `split`
    * column; fractions must sum to 1. */
  def deterministicSplit(df: DataFrame, idCol: String,
                         splits: Seq[(String, Double)]): DataFrame = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val f = hashFraction(col(idCol))
    val cumulative = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.zip(cumulative).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), hi)) =>
        when(f < hi, name).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Per-stratum deterministic sampling: keep `fractions(stratum)` of each
    * stratum (default fraction for unlisted strata). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       default: Double = 0.0): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, v).otherwise(acc)
    }
    df.where(hashFraction(col(idCol)) < frac)
  }
}
