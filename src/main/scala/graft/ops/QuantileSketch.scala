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
  * bucket CDF is exact). Sidedness: "lower edge" means lower
  * MAGNITUDE edge — for a negative bucket the decoded value is the
  * bucket's UPPER value edge, so on mixed/negative domains the
  * estimate can sit on either side of the exact quantile; the
  * one-sided estimate ≤ exact contract holds for non-negative
  * domains only, while the relative-error MAGNITUDE bound
  * |est − exact| < 2^-s · |exact| holds on both signs (both engines
  * share the convention — the SQL twins replay it sign-exactly).
  * The estimate itself is bit-portable, so the
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

  // ───────────── bounded-register (resolution-collapse) variant ─────────────
  //
  // The plain HDR state is corpus-INDEPENDENT per octave (≤ 2^s buckets
  // each) but grows with the DYNAMIC RANGE of the data — the one stated
  // trade of the round-10 design. The bounded variant pins a hard
  // per-group register budget instead: when a group's register count
  // exceeds `maxRegisters`, its resolution collapses one level
  // (s → s−1) by merging adjacent mantissa buckets, repeating until it
  // fits. The collapse is pure id arithmetic — for |id| ≥ 2,
  // id@(s−k) = sign·(((|id| − 2) >> k) + 2): the (e+62)·2^s + sub + 2
  // layout shifts exponent field and mantissa sub-bucket TOGETHER, and
  // the overflow id (124·2^s + 2) lands exactly on overflowId(s−k) —
  // so coarsening is deterministic, engine-portable, and needs no
  // decode/re-encode. Specials (0, ±1 tiny) are resolution-free and
  // pass through. The k chosen per group is itself deterministic
  // (smallest k whose DISTINCT coarsened-id count fits the budget), so
  // the whole state — including the per-group effective resolution —
  // replays in SQL and carries the full differential oracle.
  //
  // Merge law: two bounded states merge by coarsening both to the
  // coarser side's resolution (same shift) then sum(cnt) — min(s_eff)
  // is canonical, so the merge is associative/commutative like the
  // plain state. Guaranteed relative error < 2^-(s0 − k) per group
  // (magnitude bound — the same negative-domain sidedness caveat as
  // the header: a negative bucket decodes to its upper VALUE edge),
  // reported via the s_eff column.

  /** Collapse a register-id column by `k` resolution levels (`k` may
    * be a per-row column). */
  private def coarsenId(bucket: Column, k: Column): Column = {
    val a = abs(bucket)
    val c = toCol(org.apache.spark.sql.catalyst.expressions.ShiftRight(
      toExpr(a - lit(2L)), toExpr(k))) + lit(2L)
    when(a <= 1L, bucket).otherwise(when(bucket >= 0L, c).otherwise(-c))
  }

  /** Bounded-register state `(groupCol, s_eff, bucket, cnt)`: the
    * [[sketch]] state collapsed per group to at most `maxRegisters`
    * registers (resolution floor at `s − maxLevels`; a group that
    * still exceeds the budget there keeps the floor — with s0=7 and
    * maxLevels=7 that floor is one bucket per octave, ≤ 126 registers
    * over the full double range). */
  def sketchBounded(df: DataFrame, groupCol: String, value: Column,
                    s: Int = DefaultS, maxRegisters: Int = 256,
                    maxLevels: Int = DefaultS): DataFrame = {
    require(maxRegisters >= 1, s"maxRegisters must be >= 1: $maxRegisters")
    require(maxLevels >= 0 && maxLevels <= s,
      s"maxLevels must be in [0, s=$s]: $maxLevels")
    val base = sketch(df, groupCol, value, s)
    // register count at every candidate level in ONE aggregate pass
    // (level-fanout over the register table, never the corpus)
    val nr = base
      .select(col(groupCol),
        explode(sequence(lit(0), lit(maxLevels))).as("__k"), col("bucket"))
      .groupBy(col(groupCol), col("__k"))
      .agg(countDistinct(coarsenId(col("bucket"), col("__k"))).as("__nr"))
    val keff = nr.where(col("__nr") <= maxRegisters)
      .groupBy(col(groupCol)).agg(min("__k").as("__k"))
    // groups over budget even at the floor keep the floor level
    val keffAll = nr.select(col(groupCol)).distinct()
      .join(keff, Seq(groupCol), "left")
      .select(col(groupCol), coalesce(col("__k"), lit(maxLevels)).as("__k"))
    base.join(keffAll, Seq(groupCol))
      .groupBy(col(groupCol), col("__k"),
        coarsenId(col("bucket"), col("__k")).as("bucket"))
      .agg(sum("cnt").as("cnt"))
      .select(col(groupCol), (lit(s) - col("__k")).cast("int").as("s_eff"),
        col("bucket"), col("cnt"))
  }

  /** Lower-edge decode with a PER-ROW resolution column — the
    * arithmetic of [[hdrDecodeLower]] expressed in exact column ops
    * (powers of two, masks, and a (1 + sub/2^s) sum with ≤ s mantissa
    * bits — every step rounding-free IEEE, so bit-identical across
    * engines). */
  private def decodeLowerCol(id: Column, sEff: Column): Column = {
    def shr(x: Column, n: Column): Column =
      toCol(org.apache.spark.sql.catalyst.expressions.ShiftRight(toExpr(x), toExpr(n)))
    def shl(x: Column, n: Column): Column =
      toCol(org.apache.spark.sql.catalyst.expressions.ShiftLeft(toExpr(x), toExpr(n)))
    val m = abs(id)
    val eRaw = shr(m - 2L, sEff)
    val e = (eRaw - 62L).cast("int")
    val sub = (m - 2L) - shl(eRaw, sEff)
    val pow2s = shl(lit(1L), sEff).cast("double")
    val loE = when(e >= 0, shl(lit(1L), e).cast("double"))
      .otherwise(lit(1.0) / shl(lit(1L), -e).cast("double"))
    val ovf = shl(lit(124L), sEff) + lit(2L)
    val maxNorm = lit(java.lang.Math.scalb(1.0, graft.functions.HdrQuantile.MaxExp))
    val mag = when(m <= 1L, lit(0.0))
      .otherwise(when(m >= ovf, maxNorm)
        .otherwise(loE * (lit(1.0) + sub.cast("double") / pow2s)))
    when(id >= 0L, mag).otherwise(-mag)
  }

  /** Quantiles from a BOUNDED state `(groupCol, s_eff, bucket, cnt)`:
    * same walk as [[quantiles]], decode at each group's own effective
    * resolution. Returns (groupCol, pct, value, n_values, s_eff). */
  def quantilesBounded(state: DataFrame, groupCol: String,
                       percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty, "at least one percent")
    val cum = state
      .withColumn("__cum",
        sum("cnt").over(Window.partitionBy(groupCol).orderBy(col("bucket"))))
      .withColumn("__n", sum("cnt").over(Window.partitionBy(groupCol)))
    cum
      .select(col(groupCol), col("s_eff"), col("bucket"), col("__cum"),
        col("__n"), explode(array(percents.map(p => lit(p)): _*)).as("pct"))
      .where(col("__cum") >= expr("(__n * pct + 99) div 100"))
      .groupBy(col(groupCol), col("pct"))
      .agg(min("bucket").as("__b"), min("__n").as("n_values"),
        min("s_eff").as("s_eff"))
      .select(col(groupCol), col("pct"),
        decodeLowerCol(col("__b"), col("s_eff").cast("int")).as("value"),
        col("n_values"), col("s_eff"))
  }

  /** Monoid-style merge of BOUNDED states: per group, every side
    * coarsens to the minimum effective resolution present (pure id
    * shifts — the same collapse arithmetic), then counts sum. min is
    * associative/commutative, so N states land in any order;
    * re-coarsening a collapsed register is exact (shifts compose), so
    * the merge equals the from-scratch sketch coarsened to the same
    * resolution BIT-EXACTLY (spec-proven). */
  def mergeBounded(states: Seq[DataFrame], groupCol: String): DataFrame = {
    val all = states.reduce(_.unionByName(_))
    val target = all.groupBy(groupCol).agg(min("s_eff").as("__se"))
    all.join(target, Seq(groupCol))
      .groupBy(col(groupCol), col("__se"),
        coarsenId(col("bucket"),
          (col("s_eff") - col("__se")).cast("int")).as("bucket"))
      .agg(sum("cnt").as("cnt"))
      .select(col(groupCol), col("__se").cast("int").as("s_eff"),
        col("bucket"), col("cnt"))
  }

  /** DuckDB twin of [[sketchBounded]]: `rawSql` selects `(g, v)`;
    * produces a `${prefix}bs` CTE with `(g, s_eff, bucket, cnt)`
    * (prefix the names when composing several bounded sketches — the
    * q214 epoch replay — in one statement; [[sketchSql]]'s inner names
    * are subquery-scoped and never collide). */
  def sketchBoundedSql(rawSql: String, s: Int, maxRegisters: Int,
                       maxLevels: Int, prefix: String = "__q"): String = {
    s"""${prefix}b AS (${sketchSql(rawSql, s)}),
       |${prefix}lvl AS (
       |  SELECT g, __k, count(DISTINCT cb) AS __nr FROM (
       |    SELECT b.g, CAST(t.__k AS INT) AS __k,
       |           CASE WHEN abs(b.bucket) <= 1 THEN b.bucket ELSE
       |             (CASE WHEN b.bucket >= 0 THEN 1 ELSE -1 END) *
       |             (((abs(b.bucket) - 2) >> CAST(t.__k AS INT)) + 2)
       |           END AS cb
       |    FROM ${prefix}b b, range(0, ${maxLevels + 1}) t(__k))
       |  GROUP BY 1, 2),
       |${prefix}k AS (
       |  SELECT g, coalesce(min(__k) FILTER (__nr <= $maxRegisters),
       |                     $maxLevels) AS __k
       |  FROM ${prefix}lvl GROUP BY g),
       |${prefix}bs AS (
       |  SELECT b.g, CAST($s - k.__k AS INT) AS s_eff,
       |         CASE WHEN abs(b.bucket) <= 1 THEN b.bucket ELSE
       |           (CASE WHEN b.bucket >= 0 THEN 1 ELSE -1 END) *
       |           (((abs(b.bucket) - 2) >> k.__k) + 2) END AS bucket,
       |         CAST(sum(b.cnt) AS BIGINT) AS cnt
       |  FROM ${prefix}b b JOIN ${prefix}k k USING (g)
       |  GROUP BY 1, 2, 3)""".stripMargin
  }

  /** Coarsen-to-min merge of several `(g, s_eff, bucket, cnt)` CTEs —
    * the [[mergeBounded]] twin; produces `__qbs` for
    * [[quantilesBoundedSql]]. */
  def mergeBoundedSql(stateCtes: Seq[String]): String = {
    val union = stateCtes.map(c => s"SELECT * FROM $c").mkString("\n  UNION ALL ")
    s"""__qall AS ($union),
       |__qtgt AS (SELECT g, min(s_eff) AS se FROM __qall GROUP BY g),
       |__qbs AS (
       |  SELECT a.g, t.se AS s_eff,
       |         CASE WHEN abs(a.bucket) <= 1 THEN a.bucket ELSE
       |           (CASE WHEN a.bucket >= 0 THEN 1 ELSE -1 END) *
       |           (((abs(a.bucket) - 2) >> (a.s_eff - t.se)) + 2) END AS bucket,
       |         CAST(sum(a.cnt) AS BIGINT) AS cnt
       |  FROM __qall a JOIN __qtgt t USING (g)
       |  GROUP BY 1, 2, 3)""".stripMargin
  }

  /** Per-row-resolution lower-edge decode for the SQL twin (`id`,
    * `se` = s_eff expressions). */
  private def decodeLowerSqlDyn(id: String, se: String): String = {
    val m = s"abs($id)"
    val eRaw = s"(($m - 2) >> ($se))"
    val e = s"(CAST($eRaw AS INT) - 62)"
    val sub = s"(($m - 2) - ($eRaw << ($se)))"
    val pow2s = s"CAST((1::BIGINT << ($se)) AS DOUBLE)"
    val loE = s"(CASE WHEN ($e) >= 0 THEN CAST((1::BIGINT << ($e)) AS DOUBLE) " +
      s"ELSE 1.0 / CAST((1::BIGINT << (-($e))) AS DOUBLE) END)"
    val ovf = s"((124::BIGINT << ($se)) + 2)"
    val mag = s"(CASE WHEN $m <= 1 THEN 0.0 WHEN $m >= $ovf THEN $maxNormSql " +
      s"ELSE $loE * (1.0 + CAST($sub AS DOUBLE) / $pow2s) END)"
    s"(CASE WHEN ($id) >= 0 THEN $mag ELSE -$mag END)"
  }

  /** DuckDB twin of [[quantilesBounded]] over [[sketchBoundedSql]]'s
    * `__qbs` CTE (compose: `"WITH " + sketchBoundedSql(...) + "," +`
    * this). Emits `(gAs, pct, value, n_values, s_eff)`. */
  def quantilesBoundedSql(percents: Seq[Int], gAs: String = "g"): String =
    s"""__qcum AS (
       |  SELECT g, s_eff, bucket, cnt,
       |         SUM(cnt) OVER (PARTITION BY g ORDER BY bucket) AS cum,
       |         SUM(cnt) OVER (PARTITION BY g) AS n
       |  FROM __qbs
       |), __qpct AS (SELECT unnest([${percents.mkString(", ")}]) AS pct),
       |__qhit AS (
       |  SELECT g, pct, MIN(bucket) AS b, MIN(n) AS nn, MIN(s_eff) AS se
       |  FROM __qcum, __qpct
       |  WHERE cum >= (n * pct + 99) // 100
       |  GROUP BY 1, 2)
       |SELECT g AS $gAs, CAST(pct AS INT) AS pct,
       |       ${decodeLowerSqlDyn("b", "se")} AS value,
       |       CAST(nn AS BIGINT) AS n_values,
       |       CAST(se AS INT) AS s_eff
       |FROM __qhit""".stripMargin

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
