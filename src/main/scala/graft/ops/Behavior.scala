package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event-sequence analytics — the questions a product team
  * asks of exactly the event stream the reference brokers: "of the
  * users who did A, how many went on to do B, and how long do cohorts
  * keep coming back?". Both operators reduce the corpus-sized event
  * table to entity-sized intermediates FIRST and never sort globally.
  */
object Behavior {

  /** Ordered-funnel analysis: for each prefix of `steps`, the number of
    * users with a matching STRICTLY ORDERED event chain — a user counts
    * for step i+1 only with an event of that type strictly after their
    * EARLIEST completion of step i (the standard min-ts funnel cascade;
    * earliest completion maximizes the users counted downstream, so
    * the funnel is the tightest monotone sequence count).
    *
    * Scale: one filtered aggregate per step, each keyed on the user —
    * every intermediate is user-count-sized, every join is
    * same-key-partitioned (AQE plans them as one exchange chain), and
    * the per-step reduction runs map-side before its exchange. The
    * final frame is `steps.length` rows. The `(user, ts, type)`
    * projection is bound through the [[CachedFrames]] registry so the
    * k per-step filters read ONE materialization of the corpus (and,
    * in the within-session composition, ONE pass of the sessionizing
    * window) instead of k full scans; eviction under the registry cap
    * merely recomputes — pushdown-friendly either way.
    *
    * Returns `(step_idx, step, n_users, pct_of_first, pct_of_prev)` —
    * the two ratios are single IEEE divisions of exact longs
    * (engine-portable); an empty upstream step yields null ratios
    * (0/0 is "no cohort", not NaN).
    */
  def funnel(events: DataFrame, userCol: String, ts: Column,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val u = col(userCol)
    val stages = funnelStages(events, userCol, ts, typeCol, steps)
    val counts = stages.zip(steps).zipWithIndex.map {
      case ((stage, step), i) =>
        stage.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).cast("int").as("step_idx"),
            lit(step).as("step"), col("n_users"))
    }.reduce(_ unionAll _)
    val w = Window.orderBy("step_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // steps.length rows: the single-partition window is free here.
    counts
      .withColumn("__n1", first_value(col("n_users")).over(w))
      .withColumn("__np", lag(col("n_users"), 1).over(Window.orderBy("step_idx")))
      .select(col("step_idx"), col("step"), col("n_users"),
        (col("n_users").cast("double") / nullif(col("__n1"), lit(0L)))
          .as("pct_of_first"),
        (col("n_users").cast("double") / nullif(col("__np"), lit(0L)))
          .as("pct_of_prev"))
  }

  /** The min-ts funnel cascade shared by [[funnel]] and
    * [[funnelLatency]]: stage(i) = (user, __t) with __t the earliest
    * completion time of the ordered prefix steps(0..i). The single
    * `(user, ts, type)` projection all k step filters read is
    * registered with [[CachedFrames]] — one corpus scan feeds the
    * whole cascade. */
  private def funnelStages(events: DataFrame, userCol: String,
                           ts: Column, typeCol: String,
                           steps: Seq[String]): Seq[DataFrame] = {
    val u = col(userCol)
    val ev = CachedFrames.cached(
      events.select(u, ts.as("__fts"), col(typeCol).as("__ftyp")))
    val first = ev.where(col("__ftyp") === steps.head)
      .groupBy(u).agg(min(col("__fts")).as("__t"))
    steps.tail.scanLeft(first) { (prev, step) =>
      ev.where(col("__ftyp") === step)
        .join(prev.select(u, col("__t").as("__pt")), Seq(userCol))
        .where(col("__fts") > col("__pt"))
        .groupBy(u).agg(min(col("__fts")).as("__t"))
    }
  }

  /** Mirror of [[funnel]] for the DuckDB oracle. `eventsSql` must
    * select `u` (user), `ts`, `typ`. */
  def funnelSql(eventsSql: String, steps: Seq[String]): String = {
    val stages = steps.zipWithIndex.map { case (step, i) =>
      val lit = step.replace("'", "''")
      if (i == 0)
        s"s0 AS (SELECT u, min(ts) AS t FROM ev WHERE typ = '$lit' GROUP BY 1)"
      else
        s"""s$i AS (
           |  SELECT ev.u, min(ev.ts) AS t
           |  FROM ev JOIN s${i - 1} p ON p.u = ev.u
           |  WHERE ev.typ = '$lit' AND ev.ts > p.t
           |  GROUP BY 1)""".stripMargin
    }
    val counts = steps.zipWithIndex.map { case (step, i) =>
      val lit = step.replace("'", "''")
      s"SELECT ${i + 1} AS step_idx, '$lit' AS step, " +
        s"CAST(count(*) AS BIGINT) AS n_users FROM s$i"
    }
    s"""WITH ev AS ($eventsSql),
       |${stages.mkString(",\n")},
       |c AS (${counts.mkString("\nUNION ALL\n")})
       |SELECT CAST(step_idx AS INT) AS step_idx, step, n_users,
       |       CAST(n_users AS DOUBLE) /
       |         nullif(first_value(n_users) OVER (ORDER BY step_idx), 0)
       |         AS pct_of_first,
       |       CAST(n_users AS DOUBLE) /
       |         nullif(lag(n_users) OVER (ORDER BY step_idx), 0)
       |         AS pct_of_prev
       |FROM c""".stripMargin
  }

  /** Retention-cohort matrix: users grouped by their FIRST-activity
    * day (the cohort), counted on each later day they return —
    * `(cohort_day, day_offset, n_active, cohort_size, retention_pct)`,
    * one row per (cohort, offset) with at least one active user.
    * Offset 0 is the cohort itself (every member is active on their
    * own first day, so `n_active = cohort_size` there by construction
    * — the invariant a spec can assert).
    *
    * Scale: the corpus reduces to distinct (user, day) in one
    * map-side-combined exchange; first-day and the cohort join are
    * keyed on the user; the matrix is (cohorts × horizon)-sized. The
    * percentage is one IEEE division of exact longs.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
                       ts: Column): DataFrame = {
    val u = col(userCol)
    val days = events.select(u, date_trunc("day", ts).as("__day")).distinct()
    val firstDay = days.groupBy(u).agg(min(col("__day")).as("cohort_day"))
    val cells = days.join(firstDay, Seq(userCol))
      .groupBy(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    val w = Window.partitionBy("cohort_day").orderBy("day_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cohort_size", first_value(col("n_active")).over(w))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size"))
          .as("retention_pct"))
  }

  /** Gap-based sessionization: a user's events split into sessions
    * wherever the gap to the previous event exceeds `gapSeconds`,
    * reported at SESSION grain — `(user, session_id, start_us, end_us,
    * duration_us, n_events, cents)`, sessions numbered 1..n per user
    * by start time.
    *
    * The flag/cumsum formulation is tie-safe at the session level:
    * among rows sharing one instant exactly one sees the far-previous
    * instant (fires the new-session flag) and the rest see gap 0, so
    * every tied row lands in the same session whichever order the
    * engine visits them — the session AGGREGATE is deterministic even
    * though the per-row flag is not, which is why the operator emits
    * session grain and the oracle can hash it.
    *
    * Scale: one hash exchange on the user (window + the session
    * groupBy reuse it), integer epoch-micros gap arithmetic, output
    * session-count-sized. The batch complement of the q127 streaming
    * session-window merge.
    */
  def sessionize(events: DataFrame, userCol: String, ts: Column,
                 valueCents: Column, gapSeconds: Long): DataFrame = {
    val u = col(userCol)
    withSessionIds(
        events.select(u, ts.as("__ts0"),
          valueCents.cast("long").as("__c")),
        userCol, col("__ts0"), gapSeconds)
      .groupBy(u, col("session_id"))
      .agg(min(col("__e")).as("start_us"), max(col("__e")).as("end_us"),
        (max(col("__e")) - min(col("__e"))).as("duration_us"),
        count(lit(1)).as("n_events"), sum(col("__c")).as("cents"))
  }

  /** Event-grain session tagging — the input plus `__e` (epoch micros)
    * and `session_id`. The per-ROW session id is itself deterministic
    * under tied instants (exactly one tied row fires the new-session
    * flag, so every tied row's running sum lands on the same id — the
    * [[sessionize]] argument, which builds on this), which is what
    * lets downstream per-event operators (the q187 within-session
    * funnel) consume it. */
  def withSessionIds(events: DataFrame, userCol: String, ts: Column,
                     gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gap must be positive, got $gapSeconds")
    val u = col(userCol)
    val w = Window.partitionBy(u).orderBy(col("__e"))
    val run = Window.partitionBy(u).orderBy(col("__e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__e", unix_micros(ts))
      .withColumn("__new",
        (col("__e") - lag(col("__e"), 1).over(w) > gapSeconds * 1000000L)
          .or(lag(col("__e"), 1).over(w).isNull).cast("long"))
      .withColumn("session_id", sum(col("__new")).over(run))
      .drop("__new")
  }

  /** Mirror of [[sessionize]] for the DuckDB oracle. `eventsSql` must
    * select `u`, `e` (epoch micros) and `c` (cents). */
  def sessionizeSql(eventsSql: String, gapSeconds: Long,
                    keyAs: String = "u"): String =
    s"""WITH ev AS ($eventsSql),
       |f AS (
       |  SELECT u, e, c,
       |         CAST(e - lag(e) OVER (PARTITION BY u ORDER BY e)
       |              > ${gapSeconds}000000
       |           OR lag(e) OVER (PARTITION BY u ORDER BY e) IS NULL
       |           AS BIGINT) AS nw
       |  FROM ev
       |), sid AS (
       |  SELECT u, e, c,
       |         CAST(sum(nw) OVER (PARTITION BY u ORDER BY e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS session_id
       |  FROM f
       |)
       |SELECT u AS $keyAs, session_id,
       |       min(e) AS start_us, max(e) AS end_us,
       |       max(e) - min(e) AS duration_us,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(sum(c) AS BIGINT) AS cents
       |FROM sid
       |GROUP BY 1, 2""".stripMargin

  /** First-order Markov transition matrix over a user's ordered event
    * types: `(src, dst, n, p)` where `p = n / Σ_dst n` — one IEEE
    * division of exact longs. `seqCol` breaks timestamp ties so the
    * lag chain is a total order (required: tied rows carry DIFFERENT
    * types, unlike [[sessionize]]'s tie-invariant flags).
    *
    * Scale: one hash exchange on the user for the lag, then the
    * corpus reduces to a (type × type)-sized count table; the
    * src-total join is type-keyed.
    */
  def eventTransitions(events: DataFrame, userCol: String, ts: Column,
                       typeCol: String, seqCol: String): DataFrame = {
    val u = col(userCol)
    val w = Window.partitionBy(u).orderBy(ts, col(seqCol))
    val pairs = events
      .withColumn("__src", lag(col(typeCol), 1).over(w))
      .where(col("__src").isNotNull)
      .groupBy(col("__src").as("src"), col(typeCol).as("dst"))
      .agg(count(lit(1)).as("n"))
    // row totals as a window over the (type × type)-sized count table —
    // a groupBy+join reads as more natural but makes Spark re-derive
    // the pairs lineage for the build side (a SECOND full corpus scan,
    // plan-dump-caught); the window re-exchanges only the tiny table.
    val bySrc = Window.partitionBy("src")
    pairs.select(col("src"), col("dst"), col("n"),
      (col("n").cast("double") / sum(col("n")).over(bySrc)).as("p"))
  }

  /** Mirror of [[eventTransitions]] for the DuckDB oracle. `eventsSql`
    * must select `u`, `ts`, `seq`, `typ`. */
  def eventTransitionsSql(eventsSql: String): String =
    s"""WITH ev AS ($eventsSql),
       |prs AS (
       |  SELECT lag(typ) OVER (PARTITION BY u ORDER BY ts, seq) AS src,
       |         typ AS dst
       |  FROM ev
       |), cnt AS (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
       |  FROM prs WHERE src IS NOT NULL GROUP BY 1, 2
       |)
       |SELECT src, dst, n,
       |       CAST(n AS DOUBLE) /
       |         CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS p
       |FROM cnt""".stripMargin

  /** Daily activity report: per calendar day — distinct active users,
    * NEW users (first-ever-active that day), and the cumulative
    * distinct-user count (= running sum of new users, exact — no
    * sketch needed because first-day attribution is exact).
    *
    * Scale: corpus → distinct (user, day) in one map-side-combined
    * exchange, user-keyed first-day join, then everything is
    * day-count-sized — the unpartitioned running window is over the
    * calendar, not the corpus.
    */
  def activeUsersDaily(events: DataFrame, userCol: String,
                       ts: Column): DataFrame = {
    val u = col(userCol)
    val days = events.select(u, date_trunc("day", ts).as("day")).distinct()
    val firstDay = days.groupBy(u).agg(min(col("day")).as("__fd"))
    val perDay = days.join(firstDay, Seq(userCol))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"),
        sum((col("day") === col("__fd")).cast("long")).as("new_users"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // calendar-sized frame: the single-partition window is free here
    perDay.withColumn("cum_users", sum(col("new_users")).over(w))
  }

  /** [[activeUsersDaily]] + the MERGEABLE companion curve: per-day
    * portable-HLL distinct-user estimates from the same register
    * discipline q158 maintains as persisted state. The analyst gets
    * both readings from one operator — exact (first-day attribution,
    * the right default) and sketch (the register table is the
    * state a multi-source deployment can merge WITHOUT re-reading any
    * corpus: per-day (bucket, r) rows, max-merge monoid). Returns
    * (day, dau, new_users, cum_users, dau_hll).
    *
    * Scale: the exact side is [[activeUsersDaily]]'s shape; the
    * sketch side is one map-side-combined (day, bucket) exchange to a
    * calendar × 256-register table. */
  def activeUsersDailyWithSketch(events: DataFrame, userCol: String,
                                 ts: Column): DataFrame = {
    import graft.functions.PortableSketches._
    val exact = activeUsersDaily(events, userCol, ts)
    val regs = events
      .select(date_trunc("day", ts).as("day"),
        hllDigest(col(userCol)).as("__d"))
      .groupBy(col("day"), hllBucket(col("__d")).as("bucket"))
      .agg(max(hllRho(col("__d"))).as("r"))
    val approx = regs.groupBy("day")
      .agg(sum(hllRegisterTerm(col("r"))).as("zsum"),
        count(lit(1)).as("present"))
      .select(col("day"), hllEstimate(col("zsum"), col("present")).as("dau_hll"))
    exact.join(approx, Seq("day"))
  }

  /** Mirror of [[activeUsersDailyWithSketch]] for the DuckDB oracle.
    * `eventsSql` must select `u` and `ts`. */
  def activeUsersDailyWithSketchSql(eventsSql: String): String = {
    import graft.functions.PortableSketches._
    s"""WITH exact AS (${activeUsersDailySql(eventsSql)}),
       |__sregs AS (
       |  SELECT day, ${hllBucketSql("d")} AS bucket,
       |         max(${hllRhoSql("d")}) AS r
       |  FROM (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |               ${hllDigestSql("u")} AS d
       |        FROM ($eventsSql))
       |  GROUP BY 1, 2
       |), __sz AS (
       |  SELECT day, sum($hllRegisterTermSql) AS zsum, count(*) AS present
       |  FROM __sregs GROUP BY day
       |), approx AS (
       |  SELECT day, ${hllEstimateSql("zsum", "present")} AS dau_hll
       |  FROM __sz
       |)
       |SELECT exact.day AS day, dau, new_users, cum_users, dau_hll
       |FROM exact JOIN approx ON approx.day = exact.day""".stripMargin
  }

  /** Mirror of [[activeUsersDaily]] for the DuckDB oracle. `eventsSql`
    * must select `u` and `ts`. */
  def activeUsersDailySql(eventsSql: String): String =
    s"""WITH ev AS ($eventsSql),
       |days AS (SELECT DISTINCT u,
       |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM ev),
       |fd AS (SELECT u, min(day) AS fd FROM days GROUP BY 1),
       |pd AS (
       |  SELECT days.day, CAST(count(*) AS BIGINT) AS dau,
       |         CAST(sum(CAST(days.day = fd.fd AS BIGINT)) AS BIGINT)
       |           AS new_users
       |  FROM days JOIN fd ON fd.u = days.u
       |  GROUP BY 1
       |)
       |SELECT day, dau, new_users,
       |       CAST(sum(new_users) OVER (ORDER BY day
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS BIGINT) AS cum_users
       |FROM pd""".stripMargin

  /** Kaplan–Meier survival (churn) curve over user lifetimes — the
    * product-limit estimator product teams read as "what fraction of
    * users are still active t days after their first touch":
    *
    *   S(t_i) = Π_{j ≤ i} (n_j − d_j) / n_j
    *
    * with right-censoring: a user still active within `horizonHours` of
    * the corpus's last instant has not churned — their lifetime is
    * only known to be ≥ observation span, so they leave the risk set
    * without a churn event (dropping censoring would bias S down —
    * every active user would look like a churn at their last event).
    * Churn duration = days from first to last event; censor duration =
    * days from first event to observation end. All in exact integer
    * microsecond/day arithmetic.
    *
    * Portability of the cumulative PRODUCT (the operator's one
    * subtlety): each factor is a single IEEE division of exact longs,
    * and the running product folds LEFT in ascending-t order via the
    * array fold both engines evaluate identically (Spark
    * `aggregate(list, 1.0, *)` ≡ DuckDB `list_reduce(1.0 ++ list, *)`
    * — the q25 list-fold discipline applied to products), so the whole
    * curve hashes cross-engine.
    *
    * Scale: one user-keyed exchange (lifetimes), then everything is
    * DAY-COUNT-sized — the risk-set window, the factor table, and the
    * per-step fold (O(T²) on a calendar-sized T) run over the tiny
    * curve frame (single-partition windows documented free at that
    * size). Returns (t_days, n_risk, d_churn, surv) at churn steps. */
  def survivalCurve(events: DataFrame, userCol: String, ts: Column,
                    horizonHours: Int): DataFrame = {
    require(horizonHours >= 0, s"horizon must be >= 0, got $horizonHours")
    val u = col(userCol)
    val e = unix_micros(ts)
    val mx = events.agg(max(e).as("__mx"))
    val hUs = horizonHours.toLong * 3600000000L
    val lab = events.groupBy(u).agg(min(e).as("__f"), max(e).as("__l"))
      .crossJoin(mx)
      .select(
        when(col("__mx") - col("__l") > hUs,
          expr("(__l - __f) div 86400000000"))
          .otherwise(expr("(__mx - __f) div 86400000000")).as("__t"),
        (col("__mx") - col("__l") > hUs).cast("long").as("__ev"))
    val grp = lab.groupBy(col("__t"))
      .agg(sum(col("__ev")).as("d"), count(lit(1)).as("__c"))
    // day-count-sized frames from here down: the unpartitioned windows
    // run over the curve, not the corpus
    val wDesc = Window.orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grp
      .withColumn("n", sum(col("__c")).over(wDesc))
      .where(col("d") > 0)
      .withColumn("factor",
        (col("n") - col("d")).cast("double") / col("n").cast("double"))
      .withColumn("__fs", collect_list(col("factor")).over(wAsc))
      .select(col("__t").as("t_days"), col("n").as("n_risk"),
        col("d").as("d_churn"),
        aggregate(col("__fs"), lit(1.0), (a, x) => a * x).as("surv"))
  }

  /** Mirror of [[survivalCurve]] for the DuckDB oracle. `eventsSql`
    * must select `u` and `ts`. */
  def survivalCurveSql(eventsSql: String, horizonHours: Int): String = {
    val hUs = horizonHours.toLong * 3600000000L
    s"""WITH ev AS ($eventsSql),
       |p AS (SELECT max(epoch_us(ts)) AS mx FROM ev),
       |u AS (
       |  SELECT u, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
       |  FROM ev GROUP BY 1
       |), lab AS (
       |  SELECT CASE WHEN p.mx - l > $hUs THEN (l - f) // 86400000000
       |              ELSE (p.mx - f) // 86400000000 END AS t,
       |         CAST(p.mx - l > $hUs AS BIGINT) AS evt
       |  FROM u CROSS JOIN p
       |), grp AS (
       |  SELECT t, CAST(sum(evt) AS BIGINT) AS d,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM lab GROUP BY 1
       |), r AS (
       |  SELECT t, d,
       |         CAST(sum(c) OVER (ORDER BY t DESC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS n
       |  FROM grp
       |), f AS (
       |  SELECT t, d, n,
       |         CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE) AS factor
       |  FROM r WHERE d > 0
       |)
       |SELECT t AS t_days, n AS n_risk, d AS d_churn,
       |       list_reduce(list_prepend(1.0,
       |         list(factor) OVER (ORDER BY t
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |         (a, b) -> a * b) AS surv
       |FROM f""".stripMargin
  }

  /** Market-basket association pairs: for every unordered item pair
    * co-occurring in at least `minSupport` baskets — `(item_a, item_b,
    * n_ab, support, confidence, lift)`, top-`k` by lift. All three
    * measures are single IEEE divisions/multiplies of exact long
    * counts (`support = n_ab/N`, `confidence = n_ab/n_a`,
    * `lift = (n_ab·N)/(n_a·n_b)` with the products in double — exact
    * long→double conversion far past any basket count), so the report
    * hashes cross-engine.
    *
    * Scale: the APRIORI prune does the work — items below
    * `minSupport` are dropped BEFORE the within-basket pair join (a
    * pair can never out-support its rarer item), so the quadratic
    * per-basket enumeration runs over frequent items only; the join
    * is basket-keyed, counts are map-side-combined, and top-k is
    * TakeOrderedAndProject under the (lift desc, item_a, item_b)
    * total order.
    */
  def basketPairs(baskets: DataFrame, basketCol: String, itemCol: String,
                  minSupport: Long, k: Int): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val b = col(basketCol)
    val items = baskets.select(b.as("__b"), col(itemCol).as("__i"))
      .distinct()
    val n = items.agg(countDistinct(col("__b")).as("__n"))
    val freq = items.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minSupport)
    val kept = items
      .join(freq.select(col("__i"), col("__c")), Seq("__i"))
    val pairs = kept.select(col("__b"), col("__i").as("item_a"),
        col("__c").as("__ca"))
      .join(kept.select(col("__b"), col("__i").as("item_b"),
        col("__c").as("__cb")), Seq("__b"))
      .where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"), min(col("__ca")).as("__na"),
        min(col("__cb")).as("__nb"))
      .where(col("n_ab") >= minSupport)
    pairs.crossJoin(n)
      .select(col("item_a"), col("item_b"), col("n_ab"),
        (col("n_ab").cast("double") / col("__n").cast("double"))
          .as("support"),
        (col("n_ab").cast("double") / col("__na").cast("double"))
          .as("confidence"),
        (col("n_ab").cast("double") * col("__n").cast("double") /
          (col("__na").cast("double") * col("__nb").cast("double")))
          .as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(k)
  }

  /** Mirror of [[basketPairs]] for the DuckDB oracle. `basketsSql`
    * must select `b`, `i`. */
  def basketPairsSql(basketsSql: String, minSupport: Long,
                     k: Int): String =
    s"""WITH it AS (SELECT DISTINCT b, i FROM ($basketsSql)),
       |n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM it),
       |freq AS (
       |  SELECT i, CAST(count(*) AS BIGINT) AS c FROM it
       |  GROUP BY 1 HAVING count(*) >= $minSupport
       |), kept AS (
       |  SELECT it.b, it.i, freq.c FROM it JOIN freq ON freq.i = it.i
       |), prs AS (
       |  SELECT a.i AS item_a, x.i AS item_b,
       |         CAST(count(*) AS BIGINT) AS n_ab,
       |         min(a.c) AS na, min(x.c) AS nb
       |  FROM kept a JOIN kept x ON x.b = a.b AND a.i < x.i
       |  GROUP BY 1, 2 HAVING count(*) >= $minSupport
       |)
       |SELECT item_a, item_b, n_ab,
       |       CAST(n_ab AS DOUBLE) / CAST(n.n AS DOUBLE) AS support,
       |       CAST(n_ab AS DOUBLE) / CAST(na AS DOUBLE) AS confidence,
       |       CAST(n_ab AS DOUBLE) * CAST(n.n AS DOUBLE) /
       |         (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS lift
       |FROM prs, n
       |ORDER BY lift DESC, item_a, item_b
       |LIMIT $k""".stripMargin

  /** RFM segmentation: each user scored into quartiles of Recency
    * (days since last event, vs the corpus max instant), Frequency
    * (event count) and Monetary (cents sum) — the classic marketing
    * segmentation, done the SCALABLE way: quartile THRESHOLDS come
    * from the counting-CDF exact quantiles (never an ntile over one
    * global partition), broadcast back as three 1-row frames, and the
    * quartile is `1 + (v>t25) + (v>t50) + (v>t75)` — integer compares,
    * ties well-defined, engine-portable. Quartile 1 = lowest metric
    * value (for recency-days that means MOST recent).
    *
    * Scale: one map-side-combined user aggregate (bounded-cached: the
    * melt and the final join both consume it — entity-sized, and the
    * registry's eviction merely recomputes), one explode-melt pass,
    * the q144 CDF per metric, three broadcast threshold rows. Returns
    * `(user, r_days, f, m_cents, r_q, f_q, m_q, segment)`.
    */
  def rfmSegments(events: DataFrame, userCol: String, ts: Column,
                  valueCents: Column): DataFrame = {
    val u = col(userCol)
    val mx = events.agg(max(unix_micros(ts)).as("__mx"))
    val base = CachedFrames.cached(events.groupBy(u)
      .agg(max(unix_micros(ts)).as("__last"),
        count(lit(1)).as("f"),
        sum(valueCents.cast("long")).as("m_cents"))
      .crossJoin(mx)
      .select(u, ((col("__mx") - col("__last")) / lit(86400000000L))
        .cast("long").as("r_days"), col("f"), col("m_cents")))
    val melted = base.select(u, explode(array(
        struct(lit("r").as("metric"), col("r_days").as("v")),
        struct(lit("f").as("metric"), col("f").as("v")),
        struct(lit("m").as("metric"), col("m_cents").as("v")))).as("__e"))
      .select(col("__e.metric").as("metric"), col("__e.v").as("v"))
    val t = CachedFrames.cached(
      Profile.exactQuantilesBy(melted, "metric", "v", Seq(25, 50, 75))
        .groupBy("metric").agg(
          min(when(col("pct") === 25, col("value"))).as("t25"),
          min(when(col("pct") === 50, col("value"))).as("t50"),
          min(when(col("pct") === 75, col("value"))).as("t75")))
    def thr(m: String) = t.where(col("metric") === m)
      .select(col("t25").as(s"__${m}25"), col("t50").as(s"__${m}50"),
        col("t75").as(s"__${m}75"))
    def quart(v: Column, m: String): Column =
      (lit(1) + (v > col(s"__${m}25")).cast("int") +
        (v > col(s"__${m}50")).cast("int") +
        (v > col(s"__${m}75")).cast("int")).cast("int")
    base.crossJoin(thr("r")).crossJoin(thr("f")).crossJoin(thr("m"))
      .select(u, col("r_days"), col("f"), col("m_cents"),
        quart(col("r_days"), "r").as("r_q"),
        quart(col("f"), "f").as("f_q"),
        quart(col("m_cents"), "m").as("m_q"))
      .withColumn("segment",
        concat(col("r_q"), col("f_q"), col("m_q")))
  }

  /** Mirror of [[rfmSegments]] for the DuckDB oracle. `eventsSql` must
    * select `u`, `ts`, `c` (cents); `keyAs` names the user column. */
  def rfmSegmentsSql(eventsSql: String, keyAs: String = "u"): String =
    s"""WITH ev AS ($eventsSql),
       |base AS (
       |  SELECT u,
       |         (
       |           (SELECT max(epoch_us(ts)) FROM ev) - max(epoch_us(ts))
       |         ) // 86400000000 AS r_days,
       |         CAST(count(*) AS BIGINT) AS f,
       |         CAST(sum(c) AS BIGINT) AS m_cents
       |  FROM ev GROUP BY 1
       |), melted AS (
       |  SELECT 'r' AS metric, r_days AS v FROM base
       |  UNION ALL SELECT 'f', f FROM base
       |  UNION ALL SELECT 'm', m_cents FROM base
       |), c AS (
       |  SELECT metric, v, COUNT(*) AS cnt FROM melted GROUP BY 1, 2
       |), cum AS (
       |  SELECT metric, v,
       |         SUM(cnt) OVER (PARTITION BY metric ORDER BY v) AS cum,
       |         SUM(cnt) OVER (PARTITION BY metric) AS n
       |  FROM c
       |), p AS (SELECT unnest([25, 50, 75]) AS pct),
       |qs AS (
       |  SELECT metric, pct, MIN(v) AS value
       |  FROM cum, p
       |  WHERE cum >= (n * pct + 99) // 100
       |  GROUP BY 1, 2
       |), t AS (
       |  SELECT metric,
       |         min(CASE WHEN pct = 25 THEN value END) AS t25,
       |         min(CASE WHEN pct = 50 THEN value END) AS t50,
       |         min(CASE WHEN pct = 75 THEN value END) AS t75
       |  FROM qs GROUP BY 1
       |), w AS (
       |  SELECT b.*,
       |    CAST(1 + CAST(b.r_days > tr.t25 AS INT)
       |           + CAST(b.r_days > tr.t50 AS INT)
       |           + CAST(b.r_days > tr.t75 AS INT) AS INT) AS r_q,
       |    CAST(1 + CAST(b.f > tf.t25 AS INT)
       |           + CAST(b.f > tf.t50 AS INT)
       |           + CAST(b.f > tf.t75 AS INT) AS INT) AS f_q,
       |    CAST(1 + CAST(b.m_cents > tm.t25 AS INT)
       |           + CAST(b.m_cents > tm.t50 AS INT)
       |           + CAST(b.m_cents > tm.t75 AS INT) AS INT) AS m_q
       |  FROM base b,
       |       (SELECT * FROM t WHERE metric = 'r') tr,
       |       (SELECT * FROM t WHERE metric = 'f') tf,
       |       (SELECT * FROM t WHERE metric = 'm') tm
       |)
       |SELECT u AS $keyAs, r_days, f, m_cents, r_q, f_q, m_q,
       |       CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR) ||
       |         CAST(m_q AS VARCHAR) AS segment
       |FROM w""".stripMargin

  /** Top-k most frequent length-3 event paths (behavior n-grams — the
    * "how do users actually move" readout [[eventTransitions]]'s
    * first-order matrix cannot see). Same total-order lag chain
    * (`seqCol` breaks timestamp ties); paths reduce to a
    * (type³)-bounded count table in one map-side-combined exchange
    * after the user-keyed lag; top-k is TakeOrderedAndProject under
    * the (n desc, path asc) total order.
    */
  def eventPaths(events: DataFrame, userCol: String, ts: Column,
                 typeCol: String, seqCol: String, k: Int): DataFrame = {
    val u = col(userCol)
    val w = Window.partitionBy(u).orderBy(ts, col(seqCol))
    events
      .withColumn("__p1", lag(col(typeCol), 1).over(w))
      .withColumn("__p2", lag(col(typeCol), 2).over(w))
      .where(col("__p2").isNotNull)
      .groupBy(concat_ws("->", col("__p2"), col("__p1"), col(typeCol))
        .as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Mirror of [[eventPaths]] for the DuckDB oracle. `eventsSql` must
    * select `u`, `ts`, `seq`, `typ`. */
  def eventPathsSql(eventsSql: String, k: Int): String =
    s"""WITH ev AS ($eventsSql),
       |lagged AS (
       |  SELECT lag(typ, 2) OVER (PARTITION BY u ORDER BY ts, seq) AS p2,
       |         lag(typ, 1) OVER (PARTITION BY u ORDER BY ts, seq) AS p1,
       |         typ
       |  FROM ev
       |)
       |SELECT p2 || '->' || p1 || '->' || typ AS path,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM lagged WHERE p2 IS NOT NULL
       |GROUP BY 1
       |ORDER BY n DESC, path
       |LIMIT $k""".stripMargin

  /** Seasonal activity profile: the (day-of-week × hour-of-day)
    * heatmap of event counts and cents — the load/seasonality readout
    * behind capacity planning and anomaly baselining. One map-side-
    * combined aggregate to a ≤168-row table; day-of-week is Spark's
    * convention (1 = Sunday … 7 = Saturday; the oracle shifts
    * DuckDB's 0-based dow to match).
    */
  def seasonalProfile(events: DataFrame, ts: Column,
                      valueCents: Column): DataFrame =
    events.groupBy(dayofweek(ts).cast("int").as("dow"),
        hour(ts).cast("int").as("hod"))
      .agg(count(lit(1)).as("n_events"),
        sum(valueCents.cast("long")).as("cents"))

  /** Mirror of [[seasonalProfile]] for the DuckDB oracle. `eventsSql`
    * must select `ts` and `c` (cents). */
  def seasonalProfileSql(eventsSql: String): String =
    s"""WITH ev AS ($eventsSql)
       |SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
       |       CAST(hour(ts) AS INT) AS hod,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(sum(c) AS BIGINT) AS cents
       |FROM ev
       |GROUP BY 1, 2""".stripMargin

  /** Time-to-convert distribution per funnel step transition: for each
    * consecutive step pair, EXACT percentiles (the q144 counting-CDF
    * machinery — integral microsecond latencies, integer rank
    * arithmetic, no sort) of `earliest completion of step i+1 −
    * earliest completion of step i` over the users who completed both.
    * The honest latency companion to [[funnel]]'s counts: the same
    * min-ts cascade, so a user's latency is measured between the SAME
    * completions the funnel counted.
    *
    * Output `(step_pair, pct, value, n_values)` — value in integer
    * microseconds. Scale: the per-step cascade is user-count-sized
    * (see [[funnel]]); the quantile stage collapses each pair's
    * latencies to a value-domain count table in one map-side-combined
    * exchange (never a global sort).
    */
  def funnelLatency(events: DataFrame, userCol: String, ts: Column,
                    typeCol: String, steps: Seq[String],
                    percents: Seq[Int]): DataFrame = {
    require(steps.size >= 2, "funnelLatency needs at least two steps")
    val u = col(userCol)
    val stages = funnelStages(events, userCol, ts, typeCol, steps)
    val lats = stages.sliding(2).toSeq.zipWithIndex.map {
      case (Seq(a, b), i) =>
        a.select(u, col("__t").as("__ta"))
          .join(b.select(u, col("__t").as("__tb")), Seq(userCol))
          .select(
            lit(s"${i + 1}:${steps(i)}->${steps(i + 1)}").as("step_pair"),
            (unix_micros(col("__tb")) - unix_micros(col("__ta")))
              .as("lat_us"))
      case other => sys.error(s"unreachable sliding window: $other")
    }
    Profile.exactQuantilesBy(lats.reduce(_ unionAll _),
      "step_pair", "lat_us", percents)
  }

  /** Mirror of [[funnelLatency]] for the DuckDB oracle — the funnel
    * stage CTEs plus the q144 CDF replay. `eventsSql` must select
    * `u`, `ts`, `typ`. */
  def funnelLatencySql(eventsSql: String, steps: Seq[String],
                       percents: Seq[Int]): String = {
    val stages = steps.zipWithIndex.map { case (step, i) =>
      val lit = step.replace("'", "''")
      if (i == 0)
        s"s0 AS (SELECT u, min(ts) AS t FROM ev WHERE typ = '$lit' GROUP BY 1)"
      else
        s"""s$i AS (
           |  SELECT ev.u, min(ev.ts) AS t
           |  FROM ev JOIN s${i - 1} p ON p.u = ev.u
           |  WHERE ev.typ = '$lit' AND ev.ts > p.t
           |  GROUP BY 1)""".stripMargin
    }
    val pairs = (0 until steps.size - 1).map { i =>
      val label = s"${i + 1}:${steps(i)}->${steps(i + 1)}".replace("'", "''")
      s"""SELECT '$label' AS step_pair,
         |       epoch_us(b.t) - epoch_us(a.t) AS v
         |FROM s$i a JOIN s${i + 1} b ON b.u = a.u""".stripMargin
    }
    s"""WITH ev AS ($eventsSql),
       |${stages.mkString(",\n")},
       |lat AS (${pairs.mkString("\nUNION ALL\n")}),
       |c AS (
       |  SELECT step_pair, v, COUNT(*) AS cnt FROM lat GROUP BY 1, 2
       |), cum AS (
       |  SELECT step_pair, v,
       |         SUM(cnt) OVER (PARTITION BY step_pair ORDER BY v) AS cum,
       |         SUM(cnt) OVER (PARTITION BY step_pair) AS n
       |  FROM c
       |), p AS (SELECT unnest([${percents.mkString(", ")}]) AS pct)
       |SELECT step_pair, pct, MIN(v) AS value,
       |       CAST(MIN(n) AS BIGINT) AS n_values
       |FROM cum, p
       |WHERE cum >= (n * pct + 99) // 100
       |GROUP BY 1, 2""".stripMargin
  }

  /** Two-proportion A/B significance report: one row per experiment
    * with per-variant exposure/conversion counts, rates, the pooled
    * two-proportion z² statistic and a significance flag at the given
    * z² threshold (z² > 3.8415 ≈ two-sided p < .05 — comparing z²
    * against the squared critical value clears the sqrt that portable
    * arithmetic cannot take):
    *
    *   z² = (r_a − r_b)² / ( p̂(1−p̂) · (1/n_a + 1/n_b) ),
    *   p̂ = (c_a + c_b)/(n_a + n_b)
    *
    * All inputs are EXACT long counts; every derived number is one
    * fixed tree of IEEE divisions/multiplies, so rates, z² and the
    * flag replay bit-exactly cross-engine. Degenerate experiments
    * (either arm empty, or p̂ ∈ {0, 1} making the variance 0) report
    * null z² and false.
    *
    * `exposures` must be one row per (experiment unit): `variantCol`
    * ∈ {"A", "B"}, `convCol` boolean. Scale: one map-side-combined
    * aggregate to a 1-row-per-experiment table; nothing else.
    */
  def abTest(exposures: DataFrame, expCol: String, variantCol: String,
             convCol: String, z2Crit: Double = 3.8415): DataFrame = {
    val isA = col(variantCol) === "A"
    val agg = exposures.groupBy(col(expCol))
      .agg(sum(isA.cast("long")).as("n_a"),
        sum((!isA).cast("long")).as("n_b"),
        sum((isA && col(convCol)).cast("long")).as("conv_a"),
        sum((!isA && col(convCol)).cast("long")).as("conv_b"))
    val ra = col("conv_a").cast("double") / col("n_a").cast("double")
    val rb = col("conv_b").cast("double") / col("n_b").cast("double")
    val p = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val denom = p * (lit(1.0) - p) *
      (lit(1.0) / col("n_a").cast("double") +
        lit(1.0) / col("n_b").cast("double"))
    val z2 = when(col("n_a") > 0 && col("n_b") > 0 && denom > 0.0,
      (ra - rb) * (ra - rb) / denom)
    agg.select(col(expCol), col("n_a"), col("n_b"),
      col("conv_a"), col("conv_b"),
      when(col("n_a") > 0, ra).as("rate_a"),
      when(col("n_b") > 0, rb).as("rate_b"),
      z2.as("z2"),
      coalesce(z2 > z2Crit, lit(false)).as("significant"))
  }

  /** Mirror of [[abTest]] for the DuckDB oracle. `exposuresSql` must
    * select `exp`, `variant`, `conv` (boolean). */
  def abTestSql(exposuresSql: String, z2Crit: Double = 3.8415): String =
    s"""WITH e AS ($exposuresSql),
       |a AS (
       |  SELECT exp,
       |    CAST(sum(CAST(variant = 'A' AS BIGINT)) AS BIGINT) AS n_a,
       |    CAST(sum(CAST(variant <> 'A' AS BIGINT)) AS BIGINT) AS n_b,
       |    CAST(sum(CAST(variant = 'A' AND conv AS BIGINT)) AS BIGINT)
       |      AS conv_a,
       |    CAST(sum(CAST(variant <> 'A' AND conv AS BIGINT)) AS BIGINT)
       |      AS conv_b
       |  FROM e GROUP BY 1
       |), d AS (
       |  SELECT *,
       |    CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ra,
       |    CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rb,
       |    (CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
       |      AS p
       |  FROM a
       |), z AS (
       |  SELECT *,
       |    CASE WHEN n_a > 0 AND n_b > 0 AND
       |              p * (1.0 - p) * (1.0 / CAST(n_a AS DOUBLE)
       |                + 1.0 / CAST(n_b AS DOUBLE)) > 0.0
       |         THEN (ra - rb) * (ra - rb) /
       |              (p * (1.0 - p) * (1.0 / CAST(n_a AS DOUBLE)
       |                + 1.0 / CAST(n_b AS DOUBLE)))
       |    END AS z2
       |  FROM d
       |)
       |SELECT exp, n_a, n_b, conv_a, conv_b,
       |       CASE WHEN n_a > 0 THEN ra END AS rate_a,
       |       CASE WHEN n_b > 0 THEN rb END AS rate_b,
       |       z2,
       |       coalesce(z2 > $z2Crit, false) AS significant
       |FROM z""".stripMargin

  /** Mirror of [[retentionCohorts]] for the DuckDB oracle. `eventsSql`
    * must select `u` and `ts`. */
  def retentionCohortsSql(eventsSql: String): String =
    s"""WITH ev AS ($eventsSql),
       |days AS (SELECT DISTINCT u,
       |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM ev),
       |fd AS (SELECT u, min(day) AS cohort_day FROM days GROUP BY 1),
       |cells AS (
       |  SELECT fd.cohort_day,
       |         CAST(date_diff('day', fd.cohort_day, days.day) AS BIGINT)
       |           AS day_offset,
       |         CAST(count(*) AS BIGINT) AS n_active
       |  FROM days JOIN fd ON fd.u = days.u
       |  GROUP BY 1, 2)
       |SELECT cohort_day, day_offset, n_active,
       |       first_value(n_active) OVER
       |         (PARTITION BY cohort_day ORDER BY day_offset)
       |         AS cohort_size,
       |       CAST(n_active AS DOUBLE) /
       |         first_value(n_active) OVER
       |           (PARTITION BY cohort_day ORDER BY day_offset)
       |         AS retention_pct
       |FROM cells""".stripMargin
}
