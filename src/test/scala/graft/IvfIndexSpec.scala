package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ops.{Similarity, Tables}

/** The persisted IVF×int8 index path: build once as a cent_id-bucketed
  * parquet table, read back per query batch with (a) identical results
  * to the inline composition, (b) zero shuffle exchanges on the index
  * side, and (c) bucket pruning at the scan — only the probed cells'
  * buckets come off storage. This is the "persist once, scan bytes per
  * query batch" deployment contract claimed in Similarity's docs. */
class IvfIndexSpec extends SparkSpec {

  private def dropHard(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(s"spark-warehouse/$table")
    if (loc.exists()) {
      loc.listFiles().foreach(_.delete()); loc.delete()
    }
  }

  test("read-back probe matches the inline plan, is shuffle-free and bucket-pruned") {
    dropHard("ivf_idx")
    val emb = Tables.table(spark, sf, "embeddings")
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    val nlist = 16
    val cents = Similarity.writeIvfIndex(emb, "vec_id", "embedding", "ivf_idx",
      nlist = nlist, numBuckets = nlist)

    val fromIndex = Similarity.ivfTopKQuantizedFromIndex(spark, "ivf_idx",
      cents, emb, "vec_id", "embedding", queries, "qid", "qvec", k = 10, nprobe = 4)

    // (a) bit-identical to the inline composition (same deterministic
    // hash-seeded centroids, same shortlist, same re-rank)
    val inline0 = Similarity.ivfTopKQuantized(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 10, nlist = nlist, nprobe = 4)
    val got = fromIndex.orderBy("qid", "rank").collect().toSeq
    val want = inline0.orderBy("qid", "rank").collect().toSeq
    assert(got == want)

    // the coarse-quantizer tree at wprobe = ntop sees every fine cell,
    // so the index search must also reproduce the flat path exactly —
    // the q145 exactness contract on THIS deployment path (the probed-
    // cell pushdown and the cell stream both route through the tree)
    val gotTree = Similarity.ivfTopKQuantizedFromIndex(spark, "ivf_idx",
        cents, emb, "vec_id", "embedding", queries, "qid", "qvec",
        k = 10, nprobe = 4, treeProbe = Some((4, 4)))
      .orderBy("qid", "rank").collect().toSeq
    assert(gotTree == want,
      "tree probe at wprobe = ntop must reproduce the flat index search")

    // (b) + (c): plan shape of the probe — AQE off so the concrete
    // scan/exchange nodes are visible to collect (AdaptiveSparkPlanExec
    // hides its children)
    val plan =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        Similarity.ivfTopKQuantizedFromIndex(spark, "ivf_idx",
            cents, emb, "vec_id", "embedding", queries, "qid", "qvec",
            k = 10, nprobe = 4)
          .queryExecution.executedPlan
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // the only shuffles allowed are the per-query shortlist/re-rank
    // windows: hash on the query id, rows of plain scalars. The index's
    // packed codes and the corpus float vectors must never ride an
    // exchange (query cells and shortlists broadcast instead).
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    exchanges.foreach { e =>
      // the TopKScoredIds partial-aggregate buffer is a k-bounded
      // serialized heap (≤ sl (double,long) entries per query per map
      // partition) — top-k state, not index/vector payload. Exempt it
      // STRUCTURALLY: only agg-buffer attributes produced by a partial
      // object-hash aggregate feeding this exchange qualify (a data
      // column that merely happens to be named "buf" would not).
      val partialAggBuffers: Set[org.apache.spark.sql.catalyst.expressions.ExprId] =
        e.child match {
          case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
              if a.aggregateExpressions.forall(_.mode ==
                org.apache.spark.sql.catalyst.expressions.aggregate.Partial) =>
            a.aggregateExpressions
              .flatMap(_.aggregateFunction.inputAggBufferAttributes)
              .map(_.exprId).toSet
          case _ => Set.empty
        }
      val heavy = e.output.filter(a =>
        (a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
          a.dataType == org.apache.spark.sql.types.BinaryType) &&
        !partialAggBuffers.contains(a.exprId))
      assert(heavy.isEmpty,
        s"probe shuffle carries index/vector payload ${heavy.mkString(", ")}, plan:\n${plan.treeString}")
    }
    val indexScans = plan.collect {
      case s: FileSourceScanExec if s.relation.location.rootPaths
        .exists(_.toString.contains("ivf_idx")) => s
    }
    assert(indexScans.nonEmpty, "expected a scan of the persisted index table")
    indexScans.foreach { s =>
      val selected = s.optionalBucketSet
      assert(selected.isDefined, "index scan should carry a bucket filter")
      val n = selected.get.cardinality()
      assert(n < nlist,
        s"bucket pruning should select fewer than all $nlist buckets, got $n")
    }
  }

  test("labeled index: hardNegativesFromIndex == exact miner at full probe, " +
      "persisted == inline, and corpus-scale anchors never broadcast") {
    dropHard("ivf_lbl")
    val emb = Tables.table(spark, sf, "embeddings")
    val anchors = emb.select(col("vec_id").as("qid"), col("embedding").as("qvec"),
      col("label").as("qlabel"))
    val nlist = 16
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", nlist)
    Similarity.writeIvfIndexWith(emb, "vec_id", "embedding", "ivf_lbl", cents,
      numBuckets = nlist, extraCols = Seq("label"))

    // (a) nprobe = nlist + an uncut shortlist makes the indexed miner
    // EXHAUSTIVE: it must agree row-for-row with q132's exact
    // broadcast-scan miner on the same (corpus-wide) anchor set
    val n = emb.count().toInt
    val fromIndex = Similarity.hardNegativesFromIndex(
        spark.table("ivf_lbl"), cents, emb, "vec_id", "embedding", "label",
        anchors, "qid", "qvec", "qlabel", k = 5, nprobe = nlist, shortlist = n + 1)
      .orderBy("qid", "rank").collect().toSeq
    val exact = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        anchors, "qid", "qvec", "qlabel", k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(fromIndex == exact,
      "full-probe indexed mining must equal the exact miner")

    // (b) the persisted table answers like the inline labeled build
    val inline0 = Similarity.hardNegativesQuantized(
        emb, "vec_id", "embedding", "label",
        anchors, "qid", "qvec", "qlabel", k = 5, nlist = nlist, nprobe = 4)
      .orderBy("qid", "rank").collect().toSeq
    val fromIndex4 = Similarity.hardNegativesFromIndex(
        spark.table("ivf_lbl"), cents, emb, "vec_id", "embedding", "label",
        anchors, "qid", "qvec", "qlabel", k = 5, nprobe = 4)
      .orderBy("qid", "rank").collect().toSeq
    assert(fromIndex4 == inline0)

    // (b2) the coarse-quantizer TREE probe at wprobe = ntop sees every
    // fine cell, so it must equal the flat probe's results row-for-row
    // — the q145 exactness contract carried into the deployment path
    val fromIndexTree = Similarity.hardNegativesFromIndex(
        spark.table("ivf_lbl"), cents, emb, "vec_id", "embedding", "label",
        anchors, "qid", "qvec", "qlabel", k = 5, nprobe = 4,
        treeProbe = Some((4, 4)))
      .orderBy("qid", "rank").collect().toSeq
    assert(fromIndexTree == fromIndex4,
      "tree probe at wprobe = ntop must reproduce the flat index search")

    // (c) corpus-scale posture: with the broadcast gate forced below
    // the anchor count, the plan must contain NO broadcast of the
    // anchor-cell stream — the candidate join degrades to a shuffle
    // join against the bucket-local index instead of a driver OOM
    // auto-broadcast off: on a 500-row fixture the planner would
    // broadcast every side on size statistics alone — at corpus scale
    // those stats disqualify themselves and the explicit gate is the
    // only broadcast source, which is exactly what this asserts
    val plan =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(graft.ops.Dedup.MaxBroadcastIdsKey, "1")
        Similarity.hardNegativesFromIndex(
            spark.table("ivf_lbl"), cents, emb, "vec_id", "embedding", "label",
            anchors, "qid", "qvec", "qlabel", k = 5, nprobe = 4)
          .queryExecution.executedPlan
      } finally {
        spark.conf.unset(graft.ops.Dedup.MaxBroadcastIdsKey)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    val bcasts = plan.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
    }
    assert(bcasts.isEmpty,
      s"corpus-scale anchors must not broadcast, plan:\n${plan.treeString}")
    // and the index side still scans the bucketed table (bucket-local:
    // no exchange between the index scan and the candidate join)
    val indexScans = plan.collect {
      case s: FileSourceScanExec if s.relation.location.rootPaths
        .exists(_.toString.contains("ivf_lbl")) => s
    }
    assert(indexScans.nonEmpty, "expected a scan of the persisted labeled index")
  }

  test("append under the index's own model equals the one-shot index") {
    dropHard("ivf_app"); dropHard("ivf_one")
    val emb = Tables.table(spark, sf, "embeddings")
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // one pinned model for every table — an IVF index is (table, model)
    // as a pair, and appends must reuse the model the index serves
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", nlist = 16)
    val half1 = emb.where(col("vec_id") % 2 === 0)
    val half2 = emb.where(col("vec_id") % 2 === 1)

    Similarity.writeIvfIndexWith(half1, "vec_id", "embedding", "ivf_app", cents)
    Similarity.appendToIvfIndex(half2, "vec_id", "embedding", "ivf_app", cents)
    Similarity.writeIvfIndexWith(emb, "vec_id", "embedding", "ivf_one", cents)

    def topk(tableName: String) =
      Similarity.ivfTopKQuantizedFromIndex(spark, tableName, cents,
          emb, "vec_id", "embedding", queries, "qid", "qvec", k = 10, nprobe = 4)
        .orderBy("qid", "rank").collect().toSeq

    val appended = topk("ivf_app")
    assert(appended == topk("ivf_one"),
      "index grown by append must answer identically to a one-shot build")
    // neighbors from BOTH the original write and the appended half must
    // appear — otherwise the append silently served nothing
    val ids = appended.map(_.getLong(2))
    assert(ids.exists(_ % 2 == 0) && ids.exists(_ % 2 == 1),
      s"results must draw from both index generations: $ids")
  }

  test("PQ index read-back matches inline, stores only codes, appends lawfully") {
    dropHard("pq_idx"); dropHard("pq_app"); dropHard("pq_one")
    val emb = Tables.table(spark, sf, "embeddings")
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    val model = Similarity.writePqIndex(emb, "vec_id", "embedding", "pq_idx",
      m = 16, ksub = 16)
    val fromIndex = Similarity.pqTopKFromIndex(spark, "pq_idx", model,
        emb, "vec_id", "embedding", queries, "qid", "qvec", k = 10, shortlist = 64)
      .orderBy("qid", "rank").collect().toSeq
    val inline0 = Similarity.pqTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 10, m = 16, ksub = 16, shortlist = 64)
      .orderBy("qid", "rank").collect().toSeq
    assert(fromIndex == inline0,
      "persisted code table must answer identically to the inline encode")

    // the index stores m code bytes + one norm — never the float vectors
    val schema = spark.table("pq_idx").schema
    assert(!schema.exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]),
      s"PQ index must not store vectors: $schema")
    assert(schema("pqcodes").dataType == org.apache.spark.sql.types.BinaryType)

    // append under the pinned codebook equals the one-shot build
    val half1 = emb.where(col("vec_id") % 2 === 0)
    val half2 = emb.where(col("vec_id") % 2 === 1)
    Similarity.writePqIndexWith(half1, "vec_id", "embedding", "pq_app", model)
    Similarity.appendToPqIndex(half2, "vec_id", "embedding", "pq_app", model)
    Similarity.writePqIndexWith(emb, "vec_id", "embedding", "pq_one", model)
    def topk(t: String) =
      Similarity.pqTopKFromIndex(spark, t, model, emb, "vec_id", "embedding",
          queries, "qid", "qvec", k = 10, shortlist = 64)
        .orderBy("qid", "rank").collect().toSeq
    val appended = topk("pq_app")
    assert(appended == topk("pq_one"))
    val ids = appended.map(_.getLong(2))
    assert(ids.exists(_ % 2 == 0) && ids.exists(_ % 2 == 1),
      s"results must draw from both index generations: $ids")
  }

  test("sampled Lloyd training: train-on-sample recall tracks full-corpus training") {
    val emb = Tables.table(spark, sf, "embeddings")
    val queries = emb.where(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("qid").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets(Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", queries, "qid", "qvec", k = 10))
    def recall(tf: Double): Double = {
      val got = sets(Similarity.pqTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 10, m = 16, ksub = 16, shortlist = 64,
        trainIterations = 2, trainFraction = tf))
      exact.map { case (q, ns) =>
        (ns intersect got.getOrElse(q, Set.empty)).size.toDouble / ns.size
      }.sum / exact.size
    }
    val full = recall(1.0)
    val sampled = recall(0.25)
    assert(sampled >= full - 0.15,
      s"25% sampled training recall $sampled too far below full $full")
    // the trainer really trains on the sample: centroids move off the
    // sample's own seed pick (iterations=0 over the SAME deterministic
    // sample yields the untouched seeds), model covers nlist cells
    val seeds = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nlist = 16, iterations = 0, trainFraction = 0.25)
    val trained = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nlist = 16, iterations = 2, trainFraction = 0.25)
    assert(trained.length == 16 && seeds.length == 16)
    assert(trained.map(_._1).toSet == seeds.map(_._1).toSet,
      "deterministic sample must reproduce the same seed ids")
    assert(trained.exists { case (cid, v) =>
      seeds.toMap.get(cid).exists(sv => !java.util.Arrays.equals(sv, v))
    }, "sampled training left every centroid at its seed — dead training")
    intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        nlist = 16, iterations = 1, trainFraction = 0.0)
    }
    ()
  }
}
