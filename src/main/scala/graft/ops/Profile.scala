package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic table profiling — the audit a pipeline runs BEFORE ingesting
  * a corpus: per column, row/null/distinct counts and the modal value.
  * Complements the numeric profilers (q96 histogram, q97 exact
  * moments/correlation) with the categorical/sanity view.
  */
object Profile {

  /** Per-column summary rows:
    * (col_name, n_rows, n_nulls, n_distinct, top_value, top_count) —
    * n_distinct counts non-null values; top is the most frequent
    * non-null value, ties to the lexicographically smaller stringform.
    *
    * Scale design: ONE pass, ONE shuffle. Every profiled expression is
    * stringified row-locally into (col_name, value) pairs (a k-way
    * melt inside the scan's codegen stage); the (col_name, value)
    * count table collapses map-side before its single exchange, and
    * every statistic derives from that count table — the per-column
    * aggregate then moves one row per DISTINCT value, never per row.
    * Profiling k columns of a 100 TB table costs one scan + a
    * distinct-values-sized shuffle, not k jobs. */
  def summary(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val pairs = df
      .select(explode(array(cols.map { case (n, c) =>
        struct(lit(n).as("col_name"), c.cast("string").as("value"))
      }: _*)).as("__p"))
      .select(col("__p.col_name").as("col_name"), col("__p.value").as("value"))
    val counts = pairs.groupBy("col_name", "value").agg(count(lit(1)).as("__cnt"))
    counts.groupBy("col_name")
      .agg(
        sum("__cnt").as("n_rows"),
        coalesce(sum(when(col("value").isNull, col("__cnt"))), lit(0L)).as("n_nulls"),
        count(when(col("value").isNotNull, lit(1))).as("n_distinct"),
        // max count, ties to the smaller value: min over (-cnt, value)
        min(when(col("value").isNotNull,
          struct((-col("__cnt")).as("nc"), col("value").as("v")))).as("__top"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
        col("__top.v").as("top_value"),
        (-col("__top.nc")).as("top_count"))
  }

  /** Plain-column convenience form (named differently — an overload
    * would erase to the same signature as the (name, Column) one). */
  def summaryOf(df: DataFrame, colNames: String*): DataFrame =
    summary(df, colNames.map(n => n -> col(n)))
}
