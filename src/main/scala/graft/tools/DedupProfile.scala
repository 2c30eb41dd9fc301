package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the LSH dedup pipeline stages (dev aid). */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[profile] $name: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    import graft.ops._
    val docs = Tables.table(spark, d, "documents")
    val base0 = Tables.spread(docs, "doc_id")
      .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
    time("warmup (count docs)")(docs.count())
    time("1 shingle scan only")(base0.write.format("noop").mode("overwrite").save())
    val sigs = Dedup.minhashSignatures(base0, "doc_id", col("sh"), 64)
    time("2 signatures")(sigs.write.format("noop").mode("overwrite").save())
    val sigsP = sigs.persist()
    time("3 sigs persist")(sigsP.count())
    val buckets = sigsP.select(col("doc_id"),
      posexplode(Dedup.lshBuckets(col("sig"), 32, 2)).as(Seq("band", "bucket")))
    val cand = buckets.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
      .join(buckets.select(col("doc_id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .where(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    time("4 candidates")(println("  n_cand=" + cand.count()))
    spark.catalog.clearCache()
    time("5 full q35")(Dedup.minhashJaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    time("6 full q42")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.7)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
