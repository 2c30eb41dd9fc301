package graft.tools

import org.apache.spark.sql.functions._

/** Stage profile for the char-ngram Jaccard miner (q42) at a scale
  * dir: times the signature scan, the bucket enumeration, the
  * sig-prefilter, and the full miner, and reports candidate counts —
  * so the dominant stage is attributed, not guessed. Mirrors
  * [[ProfileQ38]] for the text path. */
object ProfileQ42 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_AB_DIR", "/tmp/graft-scale/x100")
    val spark = graft.engine.GraftEngine.sessionBuilder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.ops.Tables.table(spark, dir, "documents")
    def timed(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
      spark.catalog.clearCache()
    }
    val base = graft.ops.Tables.spread(docs, "doc_id")
    val n = 5; val bands = 16; val rows = 3
    val sigs = base.select(col("doc_id"),
      graft.functions.MinHashSig.sigCharsRow(col("text"), n, bands * rows).as("sig"))
    timed("signatures (count)") { sigs.count() }
    val bucketRows = sigs.select(col("doc_id"),
      posexplode(graft.ops.Dedup.lshBuckets(col("sig"), bands, rows))
        .as(Seq("band", "bucket")))
    timed("sig+buckets+enumerate") {
      graft.ops.Dedup.bucketedSelfPairs(bucketRows, "doc_id",
        Seq("band", "bucket"), graft.ops.Dedup.DefaultMaxBucket).count()
    }
    timed("grams build only (count)") {
      base.select(col("doc_id"),
        graft.ops.TextOps.ngramsAll(col("text"), n).as("sh")).select(size(col("sh"))).count()
    }
    // prefilter survivors: mirrors jaccardPairsFromShingles' sig-join
    // prefilter so its cost/selectivity is attributed separately from
    // the exact gram verify
    timed("prefilter (join sigs, 6σ)") {
      // mirrors the SHIPPED estimator: estHashes wide, byte-packed for
      // the per-candidate join (see Dedup.jaccardPairsFromShingles)
      val threshold = 0.7
      val numHashes = math.max(bands * rows, graft.ops.Dedup.DefaultEstHashes)
      val sigsW = base.select(col("doc_id"),
        graft.functions.MinHashSig.sigCharsRow(col("text"), n, numHashes).as("sig"))
      val sigsP = sigsW.persist()
      val bucketRows2 = sigsP.select(col("doc_id"),
        posexplode(graft.ops.Dedup.lshBuckets(col("sig"), bands, rows))
          .as(Seq("band", "bucket")))
      val cand = graft.ops.Dedup.bucketedSelfPairs(bucketRows2, "doc_id",
        Seq("band", "bucket"), graft.ops.Dedup.DefaultMaxBucket)
      val sixSigma = 6.0 * math.sqrt(threshold * (1 - threshold) / numHashes)
      val sigb = sigsP.select(col("doc_id"),
        graft.functions.VectorFunctions.packSigBytes(col("sig")).as("sigb"))
      val est = graft.functions.VectorFunctions
        .byteMatchCount(col("sigb_a"), col("sigb_b")).cast("double") / numHashes
      val joined = cand
        .join(sigb.select(col("doc_id").as("id_a"), col("sigb").as("sigb_a")), Seq("id_a"))
        .join(sigb.select(col("doc_id").as("id_b"), col("sigb").as("sigb_b")), Seq("id_b"))
      // distribution of the estimator over ALL candidates: how many
      // pairs a tighter cutoff would spare the exact verify
      val hist = joined
        .groupBy(floor(est * 20).as("est_bin")).count()
        .orderBy(col("est_bin").desc).collect()
      hist.foreach(r => println(f"[prof]   est>=${r.getLong(0) / 20.0}%.2f bin: ${r.getLong(1)}"))
      val r = joined.where(est >= threshold - sixSigma).count()
      sigsP.unpersist()
      r
    }
    if (sys.env.get("SPARK_GRAFT_PROF_SKIP_FULL").isEmpty)
      timed("full miner") {
        graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = n, threshold = 0.7)
          .write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}
