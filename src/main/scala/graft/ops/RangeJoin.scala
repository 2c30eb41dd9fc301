package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-scalable range joins.
  *
  * A point-in-interval join (`p BETWEEN lo AND hi`) with no equality
  * conjunct has only two built-in physical shapes in Spark: broadcast
  * nested loop (fine when one side is tiny — q67's shape) or a cartesian
  * product (never fine). When BOTH sides are large, the scalable
  * formulation is binning: quantize the value domain into fixed-width
  * bins, explode each interval to the bins it overlaps, map each point to
  * its single bin, then equi-join on the bin id with the exact range
  * predicate as a residual filter. The join becomes a plain shuffled
  * hash/sort-merge join on `__bin` — partitionable, AQE-skew-splittable,
  * no replication of either side beyond interval-width/bin-width.
  *
  * Each matching (point, interval) pair is produced exactly once because
  * a point maps to exactly one bin and an interval covers that bin at
  * most once — no post-join dedup needed.
  *
  * Bin width tuning: cost ≈ |intervals| × (avg_interval_len / binWidth)
  * replicated rows vs per-bin candidate fan-in. A width near the median
  * interval length keeps replication ≤ 2× while keeping bins selective.
  */
object RangeJoin {

  /** Join `points` to `intervals` on
    * `points(pointCol) BETWEEN intervals(loCol) AND intervals(hiCol)`.
    * Output carries all columns of both inputs (callers should alias
    * collisions away first). `binWidth` must be positive; intervals must
    * satisfy lo <= hi. */
  def binnedPointInterval(points: DataFrame, pointCol: String,
                          intervals: DataFrame, loCol: String, hiCol: String,
                          binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, Seq("__bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
