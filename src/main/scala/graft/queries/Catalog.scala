package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregated query catalog: the driver-facing inventory.
  *
  * Every entry is (name, query builder, optional DuckDB oracle SQL). An
  * entry without oracle SQL gets the driver's weaker rows-only check (used
  * for ops whose semantics aren't ANSI-SQL-expressible: LSH dedup,
  * heuristic language-ID, approximate sketches).
  */
/** Output-schema lint for catalog queries.
  *
  * The driver's pandas comparator sorts every output column and cannot
  * factorize ndarray/dict cells, so a catalog query whose RESULT schema
  * has a top-level ArrayType/MapType/StructType column errors at the
  * gate rather than comparing (round-1 q25, reintroduced round-7 q119).
  * The two sanctioned fixes: unwrap lanes into scalar columns (the q25
  * pattern, CatalogScalar.scala — keeps float bits engine-exact) or
  * render to a JSON string (the q53 pattern, CatalogSql.scala — for
  * discrete payloads only). Verify enforces this lint before dumping.
  */
object SchemaLint {
  import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

  /** Names + types of top-level complex columns ("" when clean). */
  def complexTopLevel(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
                f.dataType.isInstanceOf[MapType]   ||
                f.dataType.isInstanceOf[StructType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }
}

object Catalog {
  type Q = (SparkSession, String) => DataFrame

  def entries: Seq[(String, Q, Option[String])] =
    CatalogCore.entries ++ CatalogScalar.entries ++ CatalogSql.entries ++
      CatalogSql2.entries ++ CatalogML.entries ++ CatalogML2.entries ++
      CatalogML3.entries ++ CatalogML3.entries2 ++ CatalogML4.entries ++
      CatalogML5.entries ++ CatalogML6.entries ++ CatalogML7.entries ++
      CatalogML8.entries ++ CatalogML9.entries ++ CatalogML10.entries ++
      CatalogML11.entries ++ CatalogStream.entries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    entries.map(e => (e._1, e._2)).toMap

  def oracleSql: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => (n, sql) }.toMap
}
