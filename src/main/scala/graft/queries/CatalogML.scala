package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data-pipeline extensions (dedup, similarity search, text
  * analysis, multimodal) — filled in as the ops land. */
object CatalogML {
  type Q = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Q, Option[String])] = Seq()
}
