package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md north-star "salting for
  * skew").
  *
  * AQE's skew-join handling covers sort-merge joins it can see; salting is
  * the manual fallback when a hot key would still overwhelm one task
  * (e.g. a null-like sentinel key holding 10% of 100 TB). The build side
  * is replicated `saltFactor` times; the probe side gets a deterministic
  * salt derived from a hash of its row, so each hot key fans out across
  * `saltFactor` tasks. Results are identical to the unsalted join (tested
  * in SkewJoinSpec).
  */
object SkewJoin {

  /** Probe rows tagged with a deterministic pseudo-random salt in
    * [0, saltFactor) — derived from a hash of the full row, so rows
    * sharing a hot key still spread across `saltFactor` shuffle
    * partitions. Exposed so specs can measure the fan-out directly. */
  def saltProbe(probe: DataFrame, saltFactor: Int): DataFrame =
    probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.map(col).toIndexedSeq: _*)), lit(saltFactor))
        .cast("int"))

  /** Build rows replicated once per salt value (the build side pays
    * saltFactor× its size — only sane when build ≪ probe). */
  def replicateBuild(build: DataFrame, saltFactor: Int): DataFrame =
    build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))

  def saltedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    val salted = saltProbe(probe, saltFactor)
    val replicated = replicateBuild(build, saltFactor)
    salted
      .join(replicated,
        salted("__salt") === replicated("__salt") &&
          salted(probeKey) === replicated(buildKey),
        joinType)
      .drop("__salt")
  }
}
