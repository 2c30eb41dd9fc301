package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables._
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * Revenue by region × order priority: the full dimension chain
    * (region ⋈ nation ⋈ customer, all broadcast — no shuffle of the fact
    * side) joined to orders ⋈ lineitem (the one genuine shuffle), then a
    * partial-aggregated rollup. The shape a 100 TB star-schema report
    * actually takes.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val dims = table(spark, d, "customer")
      .join(broadcast(table(spark, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(spark, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    table(spark, d, "lineitem")
      .join(table(spark, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("o_orderpriority"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}
