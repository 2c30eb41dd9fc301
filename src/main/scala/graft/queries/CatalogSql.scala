package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables._

/** Second wave of relational/scalar surface: multiset set-ops, pivot,
  * generators (explode), ordered collect, discrete percentiles, array
  * higher-order predicates, map functions, conditional expressions.
  * All oracle-checked. */
object CatalogSql {
  type Q = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Multiset (bag) semantics: EXCEPT ALL / INTERSECT ALL keep
    // duplicate cardinalities (distinct variants are q20/q21).
    ("q49_except_all", (s: SparkSession, d: String) => {
      val o = table(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .exceptAll(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    }, Some(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin)),

    ("q50_intersect_all", (s: SparkSession, d: String) => {
      val o = table(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersectAll(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    }, Some(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin)),

    // Pivot (executes as a single aggregate with conditional branches —
    // no extra shuffle vs the CASE formulation the oracle uses).
    ("q51_pivot", (s: SparkSession, d: String) => {
      table(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .orderBy("l_returnflag")
    }, Some(
      s"""SELECT l_returnflag,
         |       ${dsumSql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F,
         |       ${dsumSql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Generator / UDTF surface: posexplode over an array column.
    ("q52_explode", (s: SparkSession, d: String) => {
      table(s, d, "embeddings")
        .where(col("vec_id") < 50)
        .select(col("vec_id"),
          posexplode(slice(col("embedding"), 1, 8)).as(Seq("pos", "val")))
        .orderBy("vec_id", "pos")
    }, Some(
      """SELECT vec_id,
        |       unnest(range(0, 8)) AS pos,
        |       unnest(embedding[1:8]) AS val
        |FROM embeddings WHERE vec_id < 50
        |ORDER BY vec_id, pos""".stripMargin)),

    // Ordered collect: sort_array(collect_list) is the deterministic form
    // (bare collect_list order is partitioning-dependent). The output is
    // rendered as a canonical JSON string — the driver's pandas compare
    // cannot sort raw array cells (round-1 q53 failure), and "[1,2,3]" of
    // bigints is byte-identical across engines.
    ("q53_agg_collect", (s: SparkSession, d: String) => {
      table(s, d, "customer")
        .filter(col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(to_json(sort_array(collect_list(col("c_custkey")))).as("custkeys"),
          count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    }, Some(
      """SELECT c_nationkey,
        |       '[' || array_to_string(list_sort(list(c_custkey)), ',') || ']' AS custkeys,
        |       count(*) AS n
        |FROM customer WHERE c_acctbal > 9000
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // Discrete percentiles (exact element pick — engine-independent,
    // unlike interpolated percentile_cont whose fp expression differs).
    // Formulated as a cume_dist window + conditional min — identical
    // semantics to percentile_disc (smallest value with cume_dist >= p)
    // but it sorts distributively instead of buffering every value into
    // Spark's Percentile aggregate (25s → <2s at sf0.1, and the
    // per-group buffer no longer grows with the data).
    ("q54_agg_percentile", (s: SparkSession, d: String) => {
      table(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderstatus,
          |       min(CASE WHEN cd >= 0.5 THEN o_totalprice END) AS p50,
          |       min(CASE WHEN cd >= 0.9 THEN o_totalprice END) AS p90,
          |       min(o_totalprice) AS lo, max(o_totalprice) AS hi
          |FROM (SELECT o_orderstatus, o_totalprice,
          |             cume_dist() OVER (PARTITION BY o_orderstatus
          |                               ORDER BY o_totalprice) AS cd
          |      FROM orders)
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }, Some(
      """SELECT o_orderstatus,
        |       quantile_disc(o_totalprice, 0.5) AS p50,
        |       quantile_disc(o_totalprice, 0.9) AS p90,
        |       min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Array higher-order predicates: filter / exists / forall.
    ("q55_array_hof", (s: SparkSession, d: String) => {
      table(s, d, "embeddings")
        .select(col("vec_id"),
          size(filter(col("embedding"), x => x > 0.0f)).as("n_pos"),
          exists(col("embedding"), x => x > 2.0f).as("any_big"),
          forall(col("embedding"), x => x < 10.0f).as("all_small"))
        .orderBy("vec_id")
    }, Some(
      """SELECT vec_id,
        |       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
        |       len(list_filter(embedding, x -> x > 2)) > 0 AS any_big,
        |       len(list_filter(embedding, x -> NOT (x < 10))) = 0 AS all_small
        |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // Map functions: construction + key extraction + cardinality.
    ("q56_map_ops", (s: SparkSession, d: String) => {
      val m = map(lit("type"), col("event_type"), lit("uid"),
        col("user_id").cast("string"))
      table(s, d, "events")
        .select(col("event_id"),
          element_at(m, "type").as("m_type"),
          element_at(m, "uid").as("m_uid"),
          size(m).as("m_size"),
          array_contains(map_keys(m), "type").as("has_type"))
        .orderBy("event_id")
    }, Some(
      """SELECT event_id,
        |       MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}['type'][1] AS m_type,
        |       MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}['uid'][1] AS m_uid,
        |       CAST(cardinality(MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}) AS INTEGER) AS m_size,
        |       list_contains(map_keys(MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}), 'type') AS has_type
        |FROM events ORDER BY event_id""".stripMargin)),

    // As-of join via the custom whole-operator path: AsOfJoinPlan logical
    // node + AsOfJoinStrategy + co-partitioned sort-merge AsOfJoinExec
    // (same oracle as q09's union-window formulation — the two
    // implementations are also differentially tested in OpsSpec).
    ("q58_join_asof_planned", (s: SparkSession, d: String) => {
      val events = table(s, d, "events").select("event_id", "user_id", "ts")
      val orders = table(s, d, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      graft.ops.AsOfJoin.asofPlanned(events, orders,
          leftOn = "user_id", rightOn = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightCols = Seq("o_orderkey", "o_totalprice"))
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

    // Conditional expressions: CASE tiers, coalesce/nullif.
    ("q57_conditional", (s: SparkSession, d: String) => {
      table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 30, "mid")
            .otherwise("high").as("qty_tier"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("rf_or_none"),
          (col("l_discount") > 0.05).as("discounted"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "qty_tier",
          "rf_or_none", "discounted")
    }, Some(
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       CASE WHEN l_quantity < 10 THEN 'low'
        |            WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS qty_tier,
        |       coalesce(nullif(l_returnflag, 'N'), 'none') AS rf_or_none,
        |       l_discount > 0.05 AS discounted
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, qty_tier, rf_or_none, discounted""".stripMargin))
  )
}
