package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffle data once at write time so later
  * equi-joins and aggregations on the bucket key run with NO exchange.
  *
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every join and paying the shuffle exactly once at ingest: two tables
  * bucketed by the same key into the same bucket count sort-merge-join
  * partition-locally (see BucketingSpec, which asserts the joined plan
  * contains no shuffle exchange).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (parquet). */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit =
    writeBucketedBy(df, tableName, numBuckets, Seq(bucketCol), sortCol.toSeq)

  /** Multi-column variant (e.g. an LSH bucket table keyed by
    * (band, bucket)): hash-bucketed on `bucketCols`, optionally sorted
    * within files. */
  def writeBucketedBy(df: DataFrame, tableName: String, numBuckets: Int,
                      bucketCols: Seq[String],
                      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*))
      .saveAsTable(tableName)
  }

  /** Append rows into an EXISTING bucketed table. The bucket spec must
    * match the table's (Spark validates against the catalog and throws
    * on mismatch); appended rows are hashed into per-bucket files like
    * the original write, so bucketed reads — and their no-exchange join
    * plans — keep working over old + new data together. This is what
    * makes a bucketed table an *incrementally maintainable* index
    * rather than a write-once artifact. */
  def appendBucketedBy(df: DataFrame, tableName: String, numBuckets: Int,
                       bucketCols: Seq[String],
                       sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty)
    val w = df.write.mode("append").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*))
      .saveAsTable(tableName)
  }

  /** Join two same-bucketed tables on their bucket key — planner sees the
    * matching output partitioning and elides both exchanges. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String,
                   joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey),
      joinType)
}
