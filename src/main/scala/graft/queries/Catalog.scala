package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregated query catalog: the driver-facing inventory.
  *
  * Every entry is (name, query builder, optional DuckDB oracle SQL). An
  * entry without oracle SQL gets the driver's weaker rows-only check (used
  * for ops whose semantics aren't ANSI-SQL-expressible: LSH dedup,
  * heuristic language-ID, approximate sketches).
  */
object Catalog {
  type Q = (SparkSession, String) => DataFrame

  def entries: Seq[(String, Q, Option[String])] =
    CatalogCore.entries ++ CatalogScalar.entries ++ CatalogSql.entries ++
      CatalogSql2.entries ++ CatalogML.entries ++ CatalogML2.entries ++
      CatalogML3.entries ++ CatalogML3.entries2

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    entries.map(e => (e._1, e._2)).toMap

  def oracleSql: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => (n, sql) }.toMap
}
