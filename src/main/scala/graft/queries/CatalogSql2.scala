package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Tables._

/** Third wave: subqueries (correlated scalar, EXISTS/IN through SQL),
  * distribution window functions, more string functions. */
object CatalogSql2 {
  type Q = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Correlated scalar subquery (decorrelated by Catalyst into a join).
    ("q59_scalar_subquery", (s: SparkSession, d: String) => {
      registerAll(s, d)
      s.sql(
        """SELECT o_orderkey, o_totalprice,
          |       (SELECT max(l_quantity) FROM lineitem
          |        WHERE l_orderkey = o_orderkey) AS max_qty
          |FROM orders ORDER BY o_orderkey""".stripMargin)
    }, Some(
      """SELECT o_orderkey, o_totalprice,
        |       (SELECT max(l_quantity) FROM lineitem
        |        WHERE l_orderkey = o_orderkey) AS max_qty
        |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // EXISTS / NOT IN through the SQL surface (API variants are q06/q07).
    ("q60_exists_subquery", (s: SparkSession, d: String) => {
      registerAll(s, d)
      s.sql(
        """SELECT c_custkey, c_name FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
          |  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
          |ORDER BY c_custkey""".stripMargin)
    }, Some(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin)),

    // Distribution window functions: percent_rank / cume_dist / lag with
    // default. Ranks over a deterministic total order.
    ("q61_window_dist", (s: SparkSession, d: String) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      table(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          percent_rank().over(w).as("prk"),
          cume_dist().over(w).as("cd"),
          lag(col("o_totalprice"), 1, -1.0).over(w).as("prev_price"))
        .orderBy("o_orderstatus", "o_totalprice", "o_orderkey")
    }, Some(
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |       percent_rank() OVER w AS prk,
        |       cume_dist() OVER w AS cd,
        |       lag(o_totalprice, 1, -1.0) OVER w AS prev_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY o_orderstatus, o_totalprice, o_orderkey""".stripMargin)),

    // Full outer join (left/semi/anti are q05-q07). Null sort order made
    // explicit because engines disagree on the default (Spark ASC = nulls
    // first, DuckDB = nulls last).
    ("q63_join_full", (s: SparkSession, d: String) => {
      table(s, d, "customer").select("c_custkey", "c_name")
        .join(table(s, d, "orders")
            .filter(col("o_totalprice") > 450000)
            .select("o_custkey", "o_orderkey", "o_totalprice"),
          col("c_custkey") === col("o_custkey"), "full_outer")
        .orderBy(col("c_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
    }, Some(
      """SELECT c_custkey, c_name, o_custkey, o_orderkey, o_totalprice
        |FROM (SELECT c_custkey, c_name FROM customer) c
        |FULL OUTER JOIN (SELECT o_custkey, o_orderkey, o_totalprice
        |                 FROM orders WHERE o_totalprice > 450000) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin)),

    // Cartesian product (explicit cross join of two dims).
    ("q64_join_cross", (s: SparkSession, d: String) => {
      table(s, d, "region").select("r_name")
        .crossJoin(table(s, d, "nation").select("n_name"))
        .orderBy("r_name", "n_name")
    }, Some(
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin)),

    // UNION DISTINCT (q19 is UNION ALL).
    ("q65_union_distinct", (s: SparkSession, d: String) => {
      val o = table(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .union(o.filter(col("o_totalprice") > 300000).select("o_custkey"))
        .distinct()
        .orderBy("o_custkey")
    }, Some(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY o_custkey""".stripMargin)),

    // Date functions wave 2 + null-safe equality.
    ("q66_scalar_date2", (s: SparkSession, d: String) => {
      table(s, d, "orders")
        .select(col("o_orderkey"),
          last_day(col("o_orderdate")).as("month_end"),
          add_months(col("o_orderdate").cast("date"), 2).as("plus2m"),
          date_sub(col("o_orderdate").cast("date"), 15).as("minus15d"),
          (nullif(col("o_orderstatus"), lit("P")) <=> lit("F")).as("is_f_nullsafe"))
        .orderBy("o_orderkey")
    }, Some(
      """SELECT o_orderkey,
        |       last_day(o_orderdate) AS month_end,
        |       CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |       CAST(o_orderdate - INTERVAL 15 DAY AS DATE) AS minus15d,
        |       nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F' AS is_f_nullsafe
        |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Pure non-equi band join (no equality conjunct): tiny band table
    // derived from region, broadcast nested-loop against lineitem — the
    // only sane physical shape for a band join whose build side is small.
    ("q67_join_band", (s: SparkSession, d: String) => {
      val bands = table(s, d, "region")
        .select(col("r_regionkey").as("band_id"),
          (col("r_regionkey") * 10.0).as("lo"),
          (col("r_regionkey") * 10.0 + 10.0).as("hi"))
      table(s, d, "lineitem")
        .join(broadcast(bands),
          col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy("band_id")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy("band_id")
    }, Some(
      s"""SELECT band_id, count(*) AS n, ${dsumSql("l_quantity")} AS qty
         |FROM lineitem
         |JOIN (SELECT r_regionkey AS band_id, r_regionkey * 10.0 AS lo,
         |             r_regionkey * 10.0 + 10.0 AS hi FROM region) b
         |  ON l_quantity >= lo AND l_quantity < hi
         |GROUP BY band_id ORDER BY band_id""".stripMargin)),

    // RANGE frame windows (value-based frame; q17 covers ROWS frames).
    // RANGE includes peer rows, so the result is deterministic even with
    // ties. Scale note: Spark recomputes bounded sliding frames per row
    // (O(n × frame rows)) — the frame width must be chosen so frames stay
    // small relative to the partition (a 50k-wide band over this price
    // distribution covered ~10% of each partition and cost 190s at sf0.1;
    // a 100-unit band covers ~10 rows and costs nothing).
    ("q68_window_range", (s: SparkSession, d: String) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"))
        .rangeBetween(-100L, Window.currentRow)
      table(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_near"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .over(w).cast("double").as("sum_near"))
        .orderBy("o_orderstatus", "o_totalprice", "o_orderkey")
    }, Some(
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |       count(*) OVER w AS n_near,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_near
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderstatus, o_totalprice, o_orderkey""".stripMargin)),

    // String functions wave 2: padding, repetition, reversal, translate,
    // position, left/right slices.
    ("q62_scalar_string2", (s: SparkSession, d: String) => {
      table(s, d, "region")
        .select(col("r_regionkey"),
          lpad(col("r_name"), 12, ".").as("padded"),
          rpad(col("r_name"), 12, "-").as("rpadded"),
          reverse(col("r_name")).as("rev"),
          translate(col("r_name"), "AE", "ae").as("xlated"),
          instr(col("r_name"), "A").as("a_pos"),
          substring(col("r_name"), 1, 3).as("l3"),
          col("r_name").substr(length(col("r_name")) - 2, lit(3)).as("r3"),
          repeat(col("r_name"), 2).as("doubled"))
        .orderBy("r_regionkey")
    }, Some(
      """SELECT r_regionkey,
        |       lpad(r_name, 12, '.') AS padded,
        |       rpad(r_name, 12, '-') AS rpadded,
        |       reverse(r_name) AS rev,
        |       translate(r_name, 'AE', 'ae') AS xlated,
        |       CAST(instr(r_name, 'A') AS INTEGER) AS a_pos,
        |       substring(r_name, 1, 3) AS l3,
        |       right(r_name, 3) AS r3,
        |       repeat(r_name, 2) AS doubled
        |FROM region ORDER BY r_regionkey""".stripMargin)),

    // Big-to-big range join via binning: both sides are large (lineitem
    // points vs per-order price intervals), so neither broadcast nested
    // loop nor cartesian survives scale. RangeJoin.binnedPointInterval
    // turns it into a shuffled equi-join on a bin id with the range
    // predicate as residual — see graft.ops.RangeJoin scaladoc.
    ("q72_join_range_binned", (s: SparkSession, d: String) => {
      val intervals = table(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          (col("o_totalprice") - lit(10.0)).as("lo"),
          col("o_totalprice").as("hi"))
      val points = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
      graft.ops.RangeJoin.binnedPointInterval(points, "l_extendedprice",
          intervals, "lo", "hi", binWidth = 16.0)
        .groupBy(floor(col("o_totalprice") / 10000.0).cast("long").as("price_bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("price_bucket")
    }, Some(
      s"""SELECT CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS price_bucket,
         |       count(*) AS n, ${dsumSql("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN orders
         |  ON l_extendedprice >= o_totalprice - 10.0 AND l_extendedprice <= o_totalprice
         |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Z-order data layout: interleave two dimensions into one sort key so
    // range-partitioned files get tight min/max on BOTH dims (multi-dim
    // scan pruning at 100 TB). The query demonstrates the locality
    // property: per z-range bucket, both dimensions stay in narrow
    // sub-ranges. Pure integer bit arithmetic → exact DuckDB oracle.
    ("q79_layout_zorder", (s: SparkSession, d: String) => {
      val x = pmod(col("o_custkey"), lit(65536L))
      val y = least(floor(col("o_totalprice") / 10.0), lit(65535.0)).cast("long")
      table(s, d, "orders")
        .select(x.as("x"), y.as("y"))
        .withColumn("z", graft.ops.Layout.zValue(col("x"), col("y")))
        .groupBy(floor(col("z") / 268435456.0).cast("long").as("zbucket")) // 2^32/16 ranges
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy("zbucket")
    }, Some {
      val zTerms = (0 until 16)
        .map(i => s"(((x >> $i) & 1) << ${2 * i}) | (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"""WITH b AS (
         |  SELECT o_custkey % 65536 AS x,
         |         CAST(least(floor(o_totalprice / 10.0), 65535.0) AS BIGINT) AS y
         |  FROM orders
         |), z AS (
         |  SELECT x, y, ($zTerms) AS z FROM b
         |)
         |SELECT CAST(floor(z / 268435456.0) AS BIGINT) AS zbucket, count(*) AS n,
         |       min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    })
  )
}
