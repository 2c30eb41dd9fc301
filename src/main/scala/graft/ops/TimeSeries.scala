package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series completeness operators — the reporting prep between raw
  * event streams and anything that assumes a dense time axis (rate
  * charts, anomaly baselines, per-interval SLO math): real event data
  * has holes, and a per-interval aggregate silently SKIPS empty
  * intervals instead of reporting them as zero/carried-forward.
  */
object TimeSeries {

  /** Per-key dense time grid with last-observation-carried-forward —
    * the classic gap-fill: bucket events per (key, grid cell), then
    * emit EVERY cell from each key's first to last observation;
    * missing cells appear with n_events = 0, a NULL raw value,
    * is_gap = true, and `locf_value` carrying the most recent observed
    * cell value forward. Each key's grid starts at an observed CELL by
    * construction, but a cell whose events all carry NULL `value`
    * aggregates to a NULL bucket_value — so `locf_value` is null only
    * until the key's first non-null observed cell value, and stays
    * non-null from there on.
    *
    * `step` is the CELL WIDTH: buckets are floor-aligned to absolute
    * multiples of step (`bucket - pmod(bucket, step)`) BEFORE
    * aggregation, so every observation lands in a grid cell and the
    * grid (which advances by step) can never skip one — an off-grid
    * observation folds into its cell rather than silently vanishing.
    *
    * `bucket` must be an integral column expression (epoch-hour,
    * epoch-day…) and `value` an integral measure (cents, counts) — the
    * grid arithmetic and the carried values stay engine-portable, no
    * float drift class (pmod alignment is integer-only and
    * floor-correct for negative buckets, where `div` would truncate
    * toward zero).
    *
    * Scale design: ONE corpus-sized exchange — the map-side-combined
    * (key, bucket) aggregate. The span probe is one tiny per-key agg
    * over the bucket table; the grid is a row-local `sequence` explode
    * over spans (output rows = Σ span/step per key — the caller's
    * explicit densification budget, bounded by time-range/step, NOT by
    * corpus size); the grid join and the LOCF window are both keyed by
    * `keyCol`, so nothing is ever single-partition. A key whose span
    * is pathologically long against `step` produces a proportionally
    * long grid — that is the densification ASK, priced in rows, and
    * the is_gap flag is what lets a report cap it downstream.
    *
    * Returns (keyCol, bucket, n_events, bucket_value, is_gap,
    * locf_value) — bucket_value stays NULL on gaps (the honest raw);
    * locf_value is the filled series. */
  def gapFillLocf(df: DataFrame, keyCol: String, bucket: Column,
                  value: Column, step: Long = 1L): DataFrame = {
    require(step >= 1, s"step must be >= 1, got $step")
    val b = bucket.cast("long")
    val cell = if (step == 1L) b else b - pmod(b, lit(step))
    val agg = df.groupBy(col(keyCol), cell.as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(value.cast("long")).as("bucket_value"))
    val spans = agg.groupBy(col(keyCol))
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"), lit(step))).as("bucket"))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("bucket_value"),
        col("n_events").isNull.as("is_gap"),
        last(col("bucket_value"), ignoreNulls = true).over(w).as("locf_value"))
  }

  /** Per-key trailing TIME-range aggregates — the sliding window that a
    * ROWS frame (q17) cannot express: each row aggregates every event of
    * its key within the last `windowMicros` microseconds INCLUSIVE of
    * the row's own instant (`[t − W, t]`), however many rows that is.
    *
    * The frame orders by integer epoch-micros, not a timestamp: RANGE
    * frame arithmetic over int64 is identical in every engine (the
    * DuckDB twin spells `RANGE BETWEEN W PRECEDING AND CURRENT ROW`
    * over the same integer), and equal-instant rows are frame PEERS on
    * both — the aggregate is well-defined under ties regardless of
    * partition order. The measure aggregates as an integer (cents,
    * counts): long sums, no float-accumulation class.
    *
    * Scale: ONE hash exchange on `keyCol` + a per-key sort; the frame
    * is evaluated by Spark's sliding-window accumulator (add/remove at
    * the frame edges), not by re-scanning `W` worth of rows per row.
    * Returns the input columns plus `epoch_us, trail_n, trail_value`.
    */
  def rollingRange(df: DataFrame, keyCol: String, ts: Column,
                   valueCents: Column, windowMicros: Long): DataFrame = {
    require(windowMicros >= 0, s"window must be >= 0, got $windowMicros")
    val w = Window.partitionBy(keyCol).orderBy(col("epoch_us"))
      .rangeBetween(-windowMicros, 0)
    df.withColumn("epoch_us", unix_micros(ts))
      .withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_value", sum(valueCents.cast("long")).over(w))
  }

  /** Trailing-window anomaly flags: each event compared against the
    * mean/variance of its key's last `windowMicros` (inclusive of the
    * row — Spark has no frame-exclusion clause, so both engines
    * include it; self-inclusion only DAMPENS the z-score, never
    * inflates it). The flag is the k-sigma rule with the division
    * cleared: `(v − S/n)² > k²·(SS/n − S²/n²)` rearranged to
    *
    *   (v·n − S)² > k² · (n·SS − S²)
    *
    * where n, S (Σcents), SS (Σcents²) are EXACT integer window sums.
    * `v·n − S` stays in int64 (bounded by max-cents · window rows —
    * ample for cent-scale measures); the SQUARES, where int64 would
    * genuinely overflow, are evaluated in double with one fixed
    * operation tree (long→double conversion and IEEE multiply are
    * engine-identical), so the boolean replays bit-exactly at any
    * magnitude the integer sums themselves admit. Rows with fewer than `minN`
    * window peers are never flagged (a 1-event window is its own
    * mean). Returns the input plus `epoch_us, trail_n, is_anomaly`.
    *
    * Scale: same single hash exchange + sliding accumulator as
    * [[rollingRange]]; all three window sums share one frame.
    */
  def rollingAnomaly(df: DataFrame, keyCol: String, ts: Column,
                     valueCents: Column, windowMicros: Long,
                     k: Int, minN: Long): DataFrame = {
    require(k > 0 && minN >= 2, s"need k > 0 and minN >= 2, got $k/$minN")
    val w = Window.partitionBy(keyCol).orderBy(col("epoch_us"))
      .rangeBetween(-windowMicros, 0)
    val v = col("__v")
    val n = col("__n"); val s = col("__s"); val ss = col("__ss")
    val lhs = (v * n - s).cast("double") * (v * n - s).cast("double")
    val rhs = lit(k.toDouble * k.toDouble) *
      (n.cast("double") * ss.cast("double") -
        s.cast("double") * s.cast("double"))
    df.withColumn("epoch_us", unix_micros(ts))
      .withColumn("__v", valueCents.cast("long"))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(v).over(w))
      .withColumn("__ss", sum(v * v).over(w))
      .withColumn("is_anomaly", n >= minN && lhs > rhs)
      .withColumnRenamed("__n", "trail_n")
      .drop("__v", "__s", "__ss")
  }

  /** Mirror of [[rollingAnomaly]]'s flag arithmetic for the DuckDB
    * oracle: the same exact integer window sums and the same double
    * tree. `evSql` must select the key as `u`, `epoch_us`, `v`
    * (cents), and any `extraCols` to carry through; emits
    * `u, [extraCols,] epoch_us, trail_n, is_anomaly` rows. */
  def rollingAnomalySql(evSql: String, windowMicros: Long, k: Int,
                        minN: Long,
                        extraCols: Seq[String] = Nil): String = {
    val extra = extraCols.map(c => s"$c, ").mkString
    s"""WITH e AS ($evSql),
       |m AS (
       |  SELECT u, ${extra}epoch_us, v,
       |         CAST(count(*) OVER w AS BIGINT) AS n,
       |         CAST(sum(v) OVER w AS BIGINT) AS s,
       |         CAST(sum(v * v) OVER w AS BIGINT) AS ss
       |  FROM e
       |  WINDOW w AS (PARTITION BY u ORDER BY epoch_us
       |    RANGE BETWEEN $windowMicros PRECEDING AND CURRENT ROW)
       |)
       |SELECT u, ${extra}epoch_us, n AS trail_n,
       |       n >= $minN AND
       |       CAST(v * n - s AS DOUBLE) * CAST(v * n - s AS DOUBLE) >
       |         ${k.toDouble * k.toDouble} *
       |         (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
       |          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
       |         AS is_anomaly
       |FROM m""".stripMargin
  }
}
