package graft.tools

import org.apache.spark.sql.functions._

/** One-off stage profile for the sign-LSH miner at a scale dir: times
  * the hyperplane projection, reports the bucket-occupancy histogram
  * and exact candidate-pair volume, then times the full miner — so a
  * slow q38 can be attributed to projection vs enumeration vs verify. */
object ProfileQ38 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_AB_DIR", "/tmp/graft-scale/x100")
    val spark = graft.engine.GraftEngine.sessionBuilder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = graft.ops.Tables.table(spark, dir, "embeddings")
    val n = emb.count()
    def timed(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val bits = graft.ops.Similarity.autoBits(n)
    println(s"[prof] n=$n bits=$bits")
    val planes = graft.ops.Similarity.hyperplanes(64, bits, 12)
    val bucketRows = emb.select(col("vec_id"), col("embedding"),
      posexplode(array(planes.toIndexedSeq.map(t =>
        graft.ops.Similarity.bucketCol(col("embedding"), t)): _*))
        .as(Seq("table_id", "bucket")))
    timed("projection+explode (count)") { bucketRows.count() }
    val hist = bucketRows.groupBy("table_id", "bucket").count()
      .select(col("count")).as[Long]
    timed("bucket histogram") {
      val h = hist.collect()
      val kept = h.filter(c => c >= 2 && c <= 1024)
      val cand = kept.map(c => c * (c - 1) / 2).sum
      val dropped = h.filter(_ > 1024)
      f"buckets=${h.length} max=${h.max} capped_out=${dropped.length} " +
        f"(rows lost ${dropped.sum}) candidates=$cand"
    }
    timed("full miner") {
      graft.ops.Dedup.embeddingCosinePairsLsh(emb, "vec_id", "embedding", 0.99)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
