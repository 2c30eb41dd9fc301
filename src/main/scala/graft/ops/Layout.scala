package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization for multi-dimensional scan pruning.
  *
  * Parquet scans prune row groups by min/max statistics. Sorting by a
  * single column clusters only that column; interleaving the bits of two
  * (or more) dimensions into a Z-order key and range-partition-sorting by
  * it gives every written file a tight min/max range on BOTH dimensions,
  * so a 100 TB scan filtered on either (or both) skips most files. The
  * key is pure integer arithmetic — codegen-friendly, engine-portable,
  * deterministic.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative int columns:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1L), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` clustered by the Z-order of two dimension columns:
    * range-partition on the z key (so files hold contiguous z ranges →
    * tight per-file min/max on both dims), sort within partitions, drop
    * the key. Use before a `.write` that downstream queries will filter
    * on either dimension. */
  def zorderBy(df: DataFrame, xCol: Column, yCol: Column,
               numPartitions: Int, bits: Int = 16): DataFrame = {
    val keyed = df.withColumn("__z", zValue(xCol, yCol, bits))
    keyed
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
