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

  def saltedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // probe rows: deterministic pseudo-random salt in [0, saltFactor)
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.map(col).toIndexedSeq: _*)), lit(saltFactor))
        .cast("int"))
    // build rows: replicated once per salt value
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(replicated,
        salted("__salt") === replicated("__salt") &&
          salted(probeKey) === replicated(buildKey),
        joinType)
      .drop("__salt")
  }
}
