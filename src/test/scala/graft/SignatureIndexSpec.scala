package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Tables}

/** The persisted MinHash-LSH signature index: the incremental-dedup
  * deployment shape. The archive's signatures and band buckets are
  * written ONCE as bucketed tables; each new crawl then probes them
  * with (a) results identical to the online cross-corpus miner and
  * (b) zero shuffle exchanges on either index table — only the new
  * crawl's (small) side moves. At 100 TB this removes the dominant
  * cost of per-crawl dedup: re-signaturing the archive. */
class SignatureIndexSpec extends SparkSpec {
  import spark.implicits._

  private def dropHard(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(s"spark-warehouse/$table")
    if (loc.exists()) {
      loc.listFiles().foreach(_.delete()); loc.delete()
    }
  }

  test("index probe equals the online cross-corpus miner and never shuffles the index") {
    dropHard("sig_idx_buckets"); dropHard("sig_idx_sigs")
    val docs = Tables.table(spark, sf, "documents")
    // "existing corpus" = most of the fixture; "new crawl" = the rest,
    // plus near-copies of two archive docs so real pairs exist
    val existing = docs.where(col("doc_id") % 5 =!= 0)
    val nearCopies = docs.where(col("doc_id").isin(1L, 2L))
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val newCrawl = docs.where(col("doc_id") % 5 === 0).unionAll(nearCopies)

    Dedup.writeSignatureIndex(existing, "doc_id", "text",
      "sig_idx_buckets", "sig_idx_sigs", shingleN = 3, numBuckets = 8)

    val fromIndex = Dedup.crossCorpusJaccardPairsFromIndex(spark,
        "sig_idx_buckets", "sig_idx_sigs", newCrawl, existing,
        "doc_id", "text", shingleN = 3, threshold = 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("j"))
      .as[(Long, Long, Double)].collect().toSet

    val online = Dedup.crossCorpusJaccardPairs(newCrawl, existing,
        "doc_id", "text", shingleN = 3, threshold = 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("j"))
      .as[(Long, Long, Double)].collect().toSet

    assert(fromIndex == online,
      s"index probe must equal the online miner: ${fromIndex.size} vs ${online.size} pairs")
    assert(fromIndex.nonEmpty, "planted near-copies must be mined")

    assertIndexSideExchangeFree("sig_idx", "sig_idx_buckets", "sig_idx_sigs",
      newCrawl, existing)
  }

  /** Plan shape: NO shuffle exchange may sit above either index-table
    * scan — the bucket table is pre-partitioned on the (band, bucket)
    * join key, the sig table on id. AQE off so concrete nodes are
    * visible; broadcast off so the joins actually exercise the
    * bucketed-shuffle shape a too-big-to-broadcast crawl would take. */
  private def assertIndexSideExchangeFree(
      pathTag: String, bucketTable: String, sigTable: String,
      newCrawl: org.apache.spark.sql.DataFrame,
      existing: org.apache.spark.sql.DataFrame): Unit = {
    val plan =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        Dedup.crossCorpusJaccardPairsFromIndex(spark,
            bucketTable, sigTable, newCrawl, existing,
            "doc_id", "text", shingleN = 3, threshold = 0.5,
            materialize = false)
          .queryExecution.executedPlan
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    // the raw index rows must reach their FIRST join without an
    // exchange (pre-bucketed on the join key); exchanges above join
    // RESULTS (candidate/prefiltered sets — near-linear in the crawl,
    // not the archive) are expected and fine
    def rawIndexBelow(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.exists(_.toString.contains(pathTag))
      case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
      case other => other.children.exists(rawIndexBelow)
    }
    val rawIndexShuffles = plan.collect {
      case e: ShuffleExchangeExec if rawIndexBelow(e.child) => e
    }
    assert(rawIndexShuffles.isEmpty,
      s"raw index rows must never ride a shuffle exchange, found ${rawIndexShuffles.size}:\n${plan.treeString}")
    val indexScans = plan.collect {
      case s: FileSourceScanExec if s.relation.location.rootPaths
        .exists(p => p.toString.contains(pathTag)) => s
    }
    // >= 2: the lazy plan (materialize = false) duplicates the prefilter
    // subtree under the survivor semi-join, so the sig table can appear
    // twice; the production path truncates and reads it once
    assert(indexScans.size >= 2, s"expected both index tables scanned:\n${plan.treeString}")
    assert(indexScans.forall(_.bucketedScan), "index scans must be bucketed reads")
  }

  test("append absorbs a new crawl: probe equals the one-shot index over the union") {
    Seq("sig_app_buckets", "sig_app_sigs", "sig_one_buckets", "sig_one_sigs")
      .foreach(dropHard)
    val docs = Tables.table(spark, sf, "documents")
    // crawl A and crawl B form the archive; the probe crawl carries
    // near-copies of one doc from EACH (found only if both crawls'
    // rows are live in the index)
    val crawlA = docs.where(col("doc_id") % 3 === 1)
    val crawlB = docs.where(col("doc_id") % 3 === 2)
    val nearCopies = docs.where(col("doc_id").isin(1L, 2L))
      .select((col("doc_id") + 200000L).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val probeCrawl = docs.where(col("doc_id") % 3 === 0).unionAll(nearCopies)
    val archive = crawlA.unionAll(crawlB)

    Dedup.writeSignatureIndex(crawlA, "doc_id", "text",
      "sig_app_buckets", "sig_app_sigs", shingleN = 3, numBuckets = 8)
    Dedup.appendToSignatureIndex(crawlB, "doc_id", "text",
      "sig_app_buckets", "sig_app_sigs", shingleN = 3, numBuckets = 8)
    Dedup.writeSignatureIndex(archive, "doc_id", "text",
      "sig_one_buckets", "sig_one_sigs", shingleN = 3, numBuckets = 8)

    def probePairs(bucketTable: String, sigTable: String) =
      Dedup.crossCorpusJaccardPairsFromIndex(spark, bucketTable, sigTable,
          probeCrawl, archive, "doc_id", "text", shingleN = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("j"))
        .as[(Long, Long, Double)].collect().toSet

    val appended = probePairs("sig_app_buckets", "sig_app_sigs")
    val oneShot = probePairs("sig_one_buckets", "sig_one_sigs")
    assert(appended == oneShot,
      s"appended index must equal the one-shot index over A∪B: " +
        s"${appended.size} vs ${oneShot.size} pairs")
    // both planted near-copies mined — i.e. rows from the ORIGINAL
    // write and from the APPEND both serve the probe
    assert(appended.exists(p => p._2 == 1L || p._1 == 1L), s"crawl-A pair missing: $appended")
    assert(appended.exists(p => p._2 == 2L || p._1 == 2L), s"crawl-B pair missing: $appended")
    // appended files land in the right buckets: probe stays exchange-free
    assertIndexSideExchangeFree("sig_app", "sig_app_buckets", "sig_app_sigs",
      probeCrawl, archive)
  }

  test("syncSignatureIndex: diff-driven append equals a full rebuild under add-only drift") {
    Seq("sig_sync_buckets", "sig_sync_sigs", "sig_rb_buckets", "sig_rb_sigs")
      .foreach(dropHard)
    val docs = Tables.table(spark, sf, "documents")
    val oldSnap = docs.where(col("doc_id") % 4 =!= 0)
    // add-only drift: the new snapshot keeps every old row and gains
    // the %4 slice plus a near-copy (so the probe can find something
    // only an absorbed row serves)
    val addedNear = docs.where(col("doc_id") === 1L)
      .select((col("doc_id") + 300000L).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val newSnap = oldSnap.unionAll(docs.where(col("doc_id") % 4 === 0))
      .unionAll(addedNear)

    Dedup.writeSignatureIndex(oldSnap, "doc_id", "text",
      "sig_sync_buckets", "sig_sync_sigs", shingleN = 3, numBuckets = 8)
    val report = Dedup.syncSignatureIndex(oldSnap, newSnap, "doc_id", "text",
        "sig_sync_buckets", "sig_sync_sigs", shingleN = 3, numBuckets = 8)
      .as[(String, Long)].collect().toMap
    assert(report.keySet == Set("added"), s"add-only drift must report only adds: $report")

    // rebuild from scratch on the new snapshot
    Dedup.writeSignatureIndex(newSnap, "doc_id", "text",
      "sig_rb_buckets", "sig_rb_sigs", shingleN = 3, numBuckets = 8)

    // the synced tables are ROW-identical to the rebuild…
    def sigRows(t: String) = spark.table(t)
      .select(col("doc_id"), col("sig").cast("array<string>"))
      .as[(Long, Seq[String])].collect().toSet
    assert(sigRows("sig_sync_sigs") == sigRows("sig_rb_sigs"))

    // …and probes answer identically (a crawl carrying near-copies of
    // an ORIGINAL row and an ADDED row exercises both generations)
    val probe = docs.where(col("doc_id").isin(1L, 2L))
      .select((col("doc_id") + 400000L).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    def probePairs(bucketTable: String, sigTable: String) =
      Dedup.crossCorpusJaccardPairsFromIndex(spark, bucketTable, sigTable,
          probe, newSnap, "doc_id", "text", shingleN = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("j"))
        .as[(Long, Long, Double)].collect().toSet
    val (synced, rebuilt) = (probePairs("sig_sync_buckets", "sig_sync_sigs"),
      probePairs("sig_rb_buckets", "sig_rb_sigs"))
    assert(synced == rebuilt,
      s"synced index must probe like the rebuild: ${synced.size} vs ${rebuilt.size}")
    assert(synced.nonEmpty, "planted near-copies must be mined")
  }

  test("syncSignatureIndex reports changed/removed but never absorbs them") {
    Seq("sig_drift_buckets", "sig_drift_sigs").foreach(dropHard)
    val docs = Tables.table(spark, sf, "documents")
    val oldSnap = docs.where(col("doc_id") < 400)
    // drift: %7 rows edited, %11 rows removed, nothing added
    val newSnap = oldSnap.where(col("doc_id") % 11 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" changed!"))).otherwise(col("text")))

    Dedup.writeSignatureIndex(oldSnap, "doc_id", "text",
      "sig_drift_buckets", "sig_drift_sigs", shingleN = 3, numBuckets = 8)
    val before = spark.table("sig_drift_sigs").count()
    val report = Dedup.syncSignatureIndex(oldSnap, newSnap, "doc_id", "text",
        "sig_drift_buckets", "sig_drift_sigs", shingleN = 3, numBuckets = 8)
      .as[(String, Long)].collect().toMap
    assert(report.keySet == Set("changed", "removed"), s"got $report")
    assert(report("changed") > 0 && report("removed") > 0)
    // stale rows stay (append-only contract); nothing was appended —
    // the report IS the rebuild signal
    assert(spark.table("sig_drift_sigs").count() == before,
      "changed/removed rows must not be appended")
  }

  test("incremental similarity graph: wave-advanced CC labels equal batch CC over the full pair set (q239 law)") {
    val docs = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val (bt, st, cc) = ("simgraph_buckets", "simgraph_sigs", "simgraph_cc")
    Tables.dropTablesAndDirs(spark, bt, st, cc, s"${cc}__next", s"${cc}__old")
    def wave(w: Int) = docs.where(col("doc_id") % 3 === w)
    Dedup.initSimilarityGraph(spark, wave(0), "doc_id", "text", bt, st, cc)
    for (w <- 1 to 2)
      Dedup.advanceSimilarityGraph(spark, wave(w),
        docs.where(col("doc_id") % 3 < w), "doc_id", "text", bt, st, cc)
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = m(spark.table(cc))
    val want = m(Dedup.connectedComponents(
      Dedup.minhashJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.7)))
    assert(got == want,
      "wave-advanced similarity-graph labels must equal batch CC")
    assert(got.nonEmpty, "fixture must mine at least one near-dup cluster")
    Tables.dropTablesAndDirs(spark, bt, st, cc)
  }
}
