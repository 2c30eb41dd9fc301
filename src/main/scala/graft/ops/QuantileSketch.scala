package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HdrBucket, HdrDecodeLower, HdrQuantile}

/** Percentiles over CONTINUOUS double domains at corpus scale — the
  * mergeable-register complement of [[Profile.exactQuantilesBy]]'s
  * counting CDF (exact, but value-domain-sized and integral-only).
  *
  * Relational shape (the [[graft.functions.PortableSketches]]
  * discipline): a sketch is a set of `(group…, bucket, cnt)` rows,
  * bucket = the exact log-linear register id of
  * [[graft.functions.HdrQuantile]]. Building one is a single
  * map-side-combined exchange of the corpus down to ≤ registers-per-
  * group rows; MERGE is `sum(cnt)` per `(group, bucket)` — a
  * commutative monoid, so epoch states land in any order, re-merge of
  * N states equals the from-scratch sketch BIT-EXACTLY, and the state
  * composes with [[Incremental.mergeStatesBy]] /
  * [[Incremental.advanceStateTableBy]] for rescan-free maintenance.
  *
  * Quantile query: a per-group cumulative count over the register
  * table (register-table-sized — never a corpus sort), rank convention
  * `ceil(n·pct/100)` shared with [[Profile.exactQuantilesBy]], the
  * answer decoded to the bucket's lower edge. Guaranteed relative
  * error < 2^-s on the VALUE (not a probabilistic rank bound — the
  * bucket CDF is exact); the estimate itself is bit-portable, so the
  * whole operator carries the full differential oracle
  * ([[sketchSql]]/[[quantilesSql]] replay the register arithmetic in
  * DuckDB from the raw rows).
  */
object QuantileSketch {

  val DefaultS: Int = HdrQuantile.DefaultS

  import org.apache.spark.sql.GraftSqlShim.{column => toCol, expression => toExpr}

  /** Register id of a double column (one compiled codegen node). */
  def hdrBucket(value: Column, s: Int = DefaultS): Column =
    toCol(HdrBucket(toExpr(value.cast("double")), s))

  /** Lower-edge decode of a register-id column. */
  def hdrDecodeLower(id: Column, s: Int = DefaultS): Column =
    toCol(HdrDecodeLower(toExpr(id.cast("long")), s))

  /** Build the register state `(groupCol, bucket, cnt)` of `value`
    * (nulls excluded; NaN counts in the overflow register — filter it
    * upstream if it should not). ONE map-side-combined exchange. */
  def sketch(df: DataFrame, groupCol: String, value: Column,
             s: Int = DefaultS): DataFrame =
    df.where(value.isNotNull)
      .groupBy(col(groupCol), hdrBucket(value, s).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Monoid merge of register states — delegates to the generic
    * state-as-data machinery, which is the composition contract:
    * `advanceStateTableBy(spark, table, sketch(delta…),
    * Seq(group, "bucket"), mergeAggs)` maintains a persisted
    * percentile state without rescans. */
  def merge(states: Seq[DataFrame], groupCol: String): DataFrame =
    Incremental.mergeStatesBy(states, Seq(groupCol, "bucket"), mergeAggs)

  /** The merge aggregates (for callers composing with
    * [[Incremental.advanceStateTableBy]] directly). */
  def mergeAggs: Seq[Column] = Seq(sum(col("cnt")).as("cnt"))

  /** Quantiles from a register state: `(groupCol, pct, value,
    * n_values)` — value is the decoded lower edge of the bucket
    * containing rank `ceil(n·pct/100)`. All arithmetic over the
    * register table (group-cardinality × registers rows). */
  def quantiles(state: DataFrame, groupCol: String, percents: Seq[Int],
                s: Int = DefaultS): DataFrame = {
    require(percents.nonEmpty, "at least one percent")
    require(percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1,100], got $percents")
    require(percents.distinct.size == percents.size,
      s"duplicate percents: $percents")
    val cum = state
      .withColumn("__cum",
        sum("cnt").over(Window.partitionBy(groupCol).orderBy(col("bucket"))))
      .withColumn("__n", sum("cnt").over(Window.partitionBy(groupCol)))
    cum
      .select(col(groupCol), col("bucket"), col("__cum"), col("__n"),
        explode(array(percents.map(p => lit(p)): _*)).as("pct"))
      .where(col("__cum") >= expr("(__n * pct + 99) div 100"))
      .groupBy(col(groupCol), col("pct"))
      .agg(min("bucket").as("__b"), min("__n").as("n_values"))
      .select(col(groupCol), col("pct"),
        hdrDecodeLower(col("__b"), s).as("value"), col("n_values"))
  }

  /** One-shot convenience: sketch + query. */
  def quantilesOf(df: DataFrame, groupCol: String, value: Column,
                  percents: Seq[Int], s: Int = DefaultS): DataFrame =
    quantiles(sketch(df, groupCol, value, s), groupCol, percents, s)

  // ───────────────────────── DuckDB twins ─────────────────────────
  //
  // The SQL side cannot read IEEE bits, so it derives the SAME exact
  // integers arithmetically: a libm log2 proposes the octave, then
  // exact power-of-two comparisons CORRECT it by ±1 (any libm is far
  // within ±1 of true log2), after which every step — divide by 2^e,
  // subtract 1 in [1,2), scale by 2^s, floor — is rounding-free IEEE
  // arithmetic. Identical bucket ids, proven by the oracle hash.

  private def loSql(k: String): String =
    s"(CASE WHEN ($k) >= 0 THEN CAST((1::BIGINT << ($k)) AS DOUBLE) " +
      s"ELSE 1.0 / CAST((1::BIGINT << (-($k))) AS DOUBLE) END)"

  private val minNormSql = s"(1.0 / CAST((1::BIGINT << ${-HdrQuantile.MinExp}) AS DOUBLE))"
  private val maxNormSql = s"CAST((1::BIGINT << ${HdrQuantile.MaxExp}) AS DOUBLE)"

  /** Register-state CTE body: `rawSql` must select `g` (group) and `v`
    * (double). Produces `(g, bucket, cnt)`. */
  def sketchSql(rawSql: String, s: Int): String = {
    val pow2sD = s"CAST((1::BIGINT << $s) AS DOUBLE)"
    val ovf = HdrQuantile.overflowId(s)
    s"""WITH __qr AS ($rawSql),
       |__qp AS (SELECT g, v, abs(v) AS a FROM __qr WHERE v IS NOT NULL),
       |__qn AS (
       |  SELECT g, v, a,
       |         GREATEST(${HdrQuantile.MinExp},
       |           LEAST(${HdrQuantile.MaxExp - 1},
       |             CAST(floor(log2(a)) AS INT))) AS cand
       |  FROM __qp WHERE a >= $minNormSql AND a < $maxNormSql),
       |__qe AS (
       |  SELECT g, v, a,
       |         CASE WHEN a < ${loSql("cand")} THEN cand - 1
       |              WHEN a >= ${loSql("cand")} * 2.0 THEN cand + 1
       |              ELSE cand END AS e
       |  FROM __qn),
       |__qs AS (
       |  SELECT g, v,
       |         ((CAST(e + 62 AS BIGINT) << $s) +
       |          CAST(floor((a / ${loSql("e")} - 1.0) * $pow2sD) AS BIGINT)
       |          + 2) AS pid
       |  FROM __qe),
       |__qids AS (
       |  SELECT g, CASE WHEN v > 0 THEN pid ELSE -pid END AS bucket
       |  FROM __qs
       |  UNION ALL
       |  SELECT g, 0::BIGINT FROM __qp WHERE a = 0
       |  UNION ALL
       |  SELECT g, CASE WHEN v > 0 THEN 1::BIGINT ELSE (-1)::BIGINT END
       |  FROM __qp WHERE a > 0 AND a < $minNormSql
       |  UNION ALL
       |  SELECT g, CASE WHEN v > 0 THEN ${ovf}::BIGINT
       |              ELSE (-$ovf)::BIGINT END
       |  FROM __qp WHERE a >= $maxNormSql)
       |SELECT g, bucket, CAST(count(*) AS BIGINT) AS cnt
       |FROM __qids GROUP BY 1, 2""".stripMargin
  }

  /** Lower-edge decode of a register-id SQL expression. */
  def decodeLowerSql(id: String, s: Int): String = {
    val pow2sD = s"CAST((1::BIGINT << $s) AS DOUBLE)"
    val ovf = HdrQuantile.overflowId(s)
    val m = s"abs($id)"
    val e = s"(CAST((($m - 2) >> $s) AS INT) - 62)"
    val sub = s"(($m - 2) & ((1::BIGINT << $s) - 1))"
    val mag = s"(CASE WHEN $m <= 1 THEN 0.0 " +
      s"WHEN $m >= $ovf THEN $maxNormSql " +
      s"ELSE ${loSql(e)} * (1.0 + CAST($sub AS DOUBLE) / $pow2sD) END)"
    s"(CASE WHEN ($id) >= 0 THEN $mag ELSE -$mag END)"
  }

  /** Quantile walk over a register state: `stateSql` must produce
    * `(g, bucket, cnt)`; emits `(g, pct, value, n_values)` — the
    * [[quantiles]] twin (`gAs` renames the group column). */
  def quantilesSql(stateSql: String, percents: Seq[Int], s: Int,
                   gAs: String = "g"): String =
    s"""WITH __qst AS ($stateSql),
       |__qcum AS (
       |  SELECT g, bucket, cnt,
       |         SUM(cnt) OVER (PARTITION BY g ORDER BY bucket) AS cum,
       |         SUM(cnt) OVER (PARTITION BY g) AS n
       |  FROM __qst
       |), __qpct AS (SELECT unnest([${percents.mkString(", ")}]) AS pct),
       |__qhit AS (
       |  SELECT g, pct, MIN(bucket) AS b, MIN(n) AS nn
       |  FROM __qcum, __qpct
       |  WHERE cum >= (n * pct + 99) // 100
       |  GROUP BY 1, 2)
       |SELECT g AS $gAs, CAST(pct AS INT) AS pct,
       |       ${decodeLowerSql("b", s)} AS value,
       |       CAST(nn AS BIGINT) AS n_values
       |FROM __qhit""".stripMargin
}
