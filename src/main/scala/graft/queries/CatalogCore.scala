package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Tables._
import graft.ops.AsOfJoin

/** Core relational surface (SURVEY.md §2b): scans, filters, every join
  * shape, aggregates, grouping sets, window functions, sort/limit, set ops.
  *
  * Every query carries a DuckDB oracle (driver t2 gate). Conventions:
  *   - deterministic total ORDER BY on both sides;
  *   - identical column aliases on both sides (driver hashes by name);
  *   - double aggregation via DECIMAL (see [[graft.ops.Tables]]);
  *   - per-row double arithmetic left untouched (bit-identical IEEE).
  *
  * Scale notes are on each query: what shuffles, what broadcasts, and why
  * the plan survives 1000 executors.
  */
object CatalogCore {
  type Q = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // ---- scan / projection / filter -----------------------------------
    // Projection reaches the parquet scan (ReadSchema pruned to 4 cols);
    // narrow, no shuffle (sort is for the oracle only).
    ("q01_scan_project", (s: SparkSession, d: String) => {
      table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixture — sort by
        // every output column for a total (engine-independent) order.
        .orderBy("l_orderkey", "l_linenumber", "net_price")
    }, Some(
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1.0 - l_discount) AS net_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price""".stripMargin)),

    // Conjunctive predicate with BETWEEN / IN / comparison — all push down
    // to the parquet reader (PushedFilters), so a 100 TB scan touches only
    // row groups whose min/max stats survive.
    ("q02_filter_pred", (s: SparkSession, d: String) => {
      table(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_returnflag").isin("A", "N") &&
          col("l_quantity") < 25)
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity",
          "l_discount", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity",
          "l_discount", "l_returnflag")
    }, Some(
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_returnflag IN ('A', 'N') AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber, l_shipdate, l_quantity, l_discount, l_returnflag""".stripMargin)),

    // ---- joins --------------------------------------------------------
    // Dimension-dimension broadcast join: zero shuffle of the fact side.
    ("q03_join_broadcast", (s: SparkSession, d: String) => {
      table(s, d, "nation")
        .join(broadcast(table(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    }, Some(
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin)),

    // Fact-fact equi-join: shuffle both sides on the key once, aggregate
    // with map-side partials. At 100 TB this is the shuffle you must pay;
    // AQE coalesces/skew-splits the post-shuffle partitions.
    ("q04_join_shuffle", (s: SparkSession, d: String) => {
      table(s, d, "lineitem")
        .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
        .orderBy("o_orderpriority")
    }, Some(
      s"""SELECT o_orderpriority, count(*) AS n_items,
         |       ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Left outer join + aggregate; count(o_orderkey) counts matches only.
    ("q05_join_left", (s: SparkSession, d: String) => {
      table(s, d, "customer")
        .join(table(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(col("o_totalprice")).as("total_spent"))
        .orderBy("c_custkey")
    }, Some(
      s"""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_spent
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin)),

    // Left-semi: existence probe, no row multiplication, right side only
    // hashed (broadcast when small).
    ("q06_join_semi", (s: SparkSession, d: String) => {
      table(s, d, "customer")
        .join(table(s, d, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }, Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin)),

    ("q07_join_anti", (s: SparkSession, d: String) => {
      table(s, d, "customer")
        .join(table(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }, Some(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin)),

    // Equi-key + range residual: executes as a hash/sort-merge join on
    // l_partkey with the range predicate as a cheap post-join filter —
    // NOT a cartesian range join.
    ("q08_join_range", (s: SparkSession, d: String) => {
      table(s, d, "part")
        .join(table(s, d, "lineitem"),
          col("l_partkey") === col("p_partkey") && col("l_quantity") < col("p_size"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy("p_brand")
    }, Some(
      s"""SELECT p_brand, count(*) AS n, ${dsumSql("l_quantity")} AS qty
         |FROM part JOIN lineitem ON l_partkey = p_partkey AND l_quantity < p_size
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // As-of join: latest order per user at each event time. Union-window
    // algorithm — one shuffle, no pair explosion (see graft.ops.AsOfJoin).
    ("q09_join_asof", (s: SparkSession, d: String) => {
      val events = table(s, d, "events").select("event_id", "user_id", "ts")
      val orders = table(s, d, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      AsOfJoin.asof(events, orders,
          leftOn = "user_id", rightOn = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightCols = Seq("o_orderkey", "o_totalprice"),
          rightTieBreak = Some("o_orderkey"))
        .orderBy("event_id")
    }, Some(
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
        |         row_number() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |SELECT event_id, user_id, ts, o_orderkey, o_totalprice
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin)),

    // ---- aggregation --------------------------------------------------
    // TPC-H Q1 shape: partial (map-side) aggregation collapses 100 TB to
    // |groups| × |partitions| before the single shuffle.
    ("q10_agg_tpch_q1", (s: SparkSession, d: String) => {
      table(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some(
      s"""SELECT l_returnflag, l_linestatus,
         |       ${dsumSql("l_quantity")} AS sum_qty,
         |       ${dsumSql("l_extendedprice")} AS sum_base_price,
         |       ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
         |       ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
         |       ${davgSql("l_quantity")} AS avg_qty,
         |       ${davgSql("l_extendedprice")} AS avg_price,
         |       count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Exact distinct aggregation (expands to a two-phase plan in Spark).
    ("q11_agg_distinct", (s: SparkSession, d: String) => {
      table(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    }, Some(
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    ("q12_distinct_rows", (s: SparkSession, d: String) => {
      table(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }, Some(
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Via the SQL surface (ROLLUP through the DataFrame API trips Spark's
    // ambiguous-column check on a join input; SQL resolves it cleanly).
    ("q13_rollup", (s: SparkSession, d: String) => {
      table(s, d, "nation").createOrReplaceTempView("nation")
      table(s, d, "region").createOrReplaceTempView("region")
      s.sql(
        """SELECT coalesce(r_name, 'ALL') AS region_name,
          |       coalesce(n_name, 'ALL') AS nation_name, count(*) AS n
          |FROM nation JOIN region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY region_name, nation_name""".stripMargin)
    }, Some(
      """SELECT coalesce(r_name, 'ALL') AS region_name,
        |       coalesce(n_name, 'ALL') AS nation_name, count(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin)),

    ("q14_cube", (s: SparkSession, d: String) => {
      table(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"), col("qty"))
        .orderBy("rf", "ls")
    }, Some(
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
         |       coalesce(l_linestatus, 'ALL') AS ls,
         |       count(*) AS n, ${dsumSql("l_quantity")} AS qty
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY rf, ls""".stripMargin)),

    // ---- window functions --------------------------------------------
    // Ranking: one shuffle on the partition key; ties in the rank window
    // are deterministic by value (equal ranks), row_number is made
    // deterministic with a full tie-break.
    ("q15_window_rank", (s: SparkSession, d: String) => {
      val wRn = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val wYr = Window.partitionBy("o_custkey")
        .orderBy(year(col("o_orderdate")).desc)
      table(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(wRn).as("rn"),
          ntile(4).over(wRn).as("nt"),
          rank().over(wYr).as("rk_year"),
          dense_rank().over(wYr).as("drk_year"))
        .orderBy("o_custkey", "rn")
    }, Some(
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
        |       ntile(4)     OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS nt,
        |       rank()       OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate) DESC) AS rk_year,
        |       dense_rank() OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate) DESC) AS drk_year
        |FROM orders ORDER BY o_custkey, rn""".stripMargin)),

    ("q16_window_lag", (s: SparkSession, d: String) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          first(col("ts")).over(wf).as("first_ts"))
        .orderBy("user_id", "event_id")
    }, Some(
      """SELECT event_id, user_id, ts, value,
        |       lag(value, 1)  OVER w AS prev_value,
        |       lead(value, 1) OVER w AS next_value,
        |       first_value(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_ts
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id, event_id""".stripMargin)),

    // Frame aggregates: running + moving sums. Decimal inside the window
    // sum keeps the running total exact (and engine-independent).
    ("q17_window_frame", (s: SparkSession, d: String) => {
      val ord = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wRun = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wMov = ord.rowsBetween(-2, Window.currentRow)
      table(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(wRun).cast("double").as("run_spend"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(wMov).cast("double").as("mov_spend"),
          count(lit(1)).over(wRun).as("n_run"))
        .orderBy("o_custkey", "o_orderkey")
    }, Some(
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |            (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |            (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_spend,
        |       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_run
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- sort / limit -------------------------------------------------
    // Global top-k: executes as TakeOrderedAndProject — per-partition
    // top-k then a k-row driver merge, never a full global sort.
    ("q18_sort_topk", (s: SparkSession, d: String) => {
      table(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }, Some(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // ---- set operations ----------------------------------------------
    ("q19_union_all", (s: SparkSession, d: String) => {
      val ev = table(s, d, "events")
      val a = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "event_type", "value")
      val b = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "event_type", "value")
      a.unionByName(b).orderBy("event_id")
    }, Some(
      """SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'view'
        |ORDER BY event_id""".stripMargin)),

    ("q20_intersect", (s: SparkSession, d: String) => {
      val o = table(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    }, Some(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin)),

    ("q21_except", (s: SparkSession, d: String) => {
      table(s, d, "customer").select(col("c_custkey").as("custkey"))
        .except(table(s, d, "orders").select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    }, Some(
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin))
  )
}
