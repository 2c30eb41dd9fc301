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
    * final frame is `steps.length` rows.
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
    // stage(i): (user, __t) = earliest completion time of steps(0..i)
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(u).agg(min(ts).as("__t"))
    val stages = steps.tail.scanLeft(first) { (prev, step) =>
      events.where(col(typeCol) === step)
        .join(prev.select(u, col("__t").as("__pt")), Seq(userCol))
        .where(ts > col("__pt"))
        .groupBy(u).agg(min(ts).as("__t"))
    }
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
