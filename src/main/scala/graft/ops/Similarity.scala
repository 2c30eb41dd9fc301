package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over embedding columns (north-star extension).
  *
  * Three tiers, by scale:
  *   - [[bruteForceTopK]] — exact; broadcast the (small) query set against
  *     the full corpus. Cost |Q|·|V|·dim with a codegen inner loop; the
  *     corpus is never shuffled, so it parallelizes linearly with
  *     executors. Right up to |Q| in the thousands at 100 TB corpus scale.
  *   - [[lshCosinePairs]] — all-pairs near-neighbor mining via
  *     random-hyperplane LSH: L independent tables of `bits` sign-bits
  *     each; candidates = bucket co-residents; exact cosine verify.
  *     Shuffles only (id, bucket) pairs, never the n² pair space.
  *   - [[ivfTopK]] — IVF-style: partition the corpus by nearest centroid,
  *     probe the `nprobe` closest centroids per query. Trades recall for
  *     a |Q|·|V|/k scan.
  *
  * All randomness is deterministic (fixed seed) so results are
  * reproducible across runs and engines.
  */
object Similarity {

  /** Cosine similarity via built-in higher-order functions only (no custom
    * expression) — kept as the portable fallback and for plan comparison
    * in the bench. */
  def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    val nb = aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    when(na === 0.0 || nb === 0.0, 0.0)
      .otherwise(greatest(lit(-1.0), least(lit(1.0), dot / (sqrt(na) * sqrt(nb)))))
  }

  /** Codegen cosine (preferred). */
  def cosine(a: Column, b: Column): Column = VectorFunctions.cosine(a, b)

  /** (qid, rank, id, score) top-k per query from a scored candidate
    * table, via the O(k)-heap aggregate (map-side combine; the shuffle
    * carries ≤ k entries per query per map partition — never a full
    * sort of the candidate set). Ordering: score desc, ties id asc.
    *
    * The heap state holds (double, long) pairs, so corpus ids must be
    * NUMERIC (checked eagerly: a string-id corpus would otherwise fail
    * mid-job (ANSI cast) or, with ANSI off, silently return empty
    * results). Ids are cast back to the input id type on the way out —
    * an int-id corpus gets int ids back; the score is always double
    * (every ANN scorer here computes in double). Null-scored/null-id
    * rows never reach a heap and are dropped — no ANN scorer produces
    * them. */
  private def topKFromScores(scored: DataFrame, qidCol: String, idCol: String,
                             scoreCol: String, k: Int): DataFrame = {
    val idType = scored.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"ANN top-k requires a numeric id column; '$idCol' is " +
        s"${idType.simpleString}. Map string/UUID ids " +
        "to a numeric surrogate (e.g. xxhash64) before the search.")
    scored
      .groupBy(col(qidCol))
      .agg(graft.functions.TopKScoredIds.agg(col(scoreCol), col(idCol), k).as("__top"))
      .select(col(qidCol), posexplode(col("__top")).as(Seq("__pos", "__s")))
      .select(col(qidCol), (col("__pos") + 1).cast("int").as("rank"),
        col("__s.id").cast(idType).as(idCol), col("__s.score").as(scoreCol))
  }

  /** Exact top-k neighbors for each query vector.
    *
    * `queries` is broadcast: the corpus side stays partition-local (no
    * shuffle of the big side); the per-query top-k runs through the
    * O(k)-heap [[graft.functions.TopKScoredIds]] aggregate with
    * map-side combine — the shuffle carries at most k (cos, id)
    * entries per query per map partition, where a row_number window
    * would shuffle and fully sort every scored corpus row. Ordering
    * semantics identical (cos desc, id asc), so results — and the
    * exact-SQL oracle — are unchanged.
    *
    * Output schema (all ANN entry points):
    * (qidCol, rank: int, idCol: the corpus id type, cos: double).
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int): DataFrame =
    broadcastScanTopK(corpus, idCol, vecCol, queries, qidCol, qvecCol, k, None)

  /** The one broadcast-scan ranking pipeline behind [[bruteForceTopK]]
    * and [[hardNegatives]] (spread → crossJoin(broadcast) → self-id
    * filter → exact cosine → O(k) heap), with an optional extra
    * predicate applied BEFORE the heap — shared so the two ranking
    * paths cannot drift. */
  private def broadcastScanTopK(corpus: DataFrame, idCol: String, vecCol: String,
                                queries: DataFrame, qidCol: String, qvecCol: String,
                                k: Int, extraFilter: Option[Column]): DataFrame = {
    // Size-gate the query/anchor broadcast exactly like
    // pqShortlistRerank: a forced broadcast() on an unexpectedly large
    // anchor batch (hardNegatives' documented use case invites one) is
    // a silent driver-OOM cliff. Cached + counted for the gate; the
    // row→byte conversion uses the batch's own vector width, in id-row
    // equivalents (bytes/40 — the calibration unit of
    // spark.graft.dedup.maxBroadcastIds). Above the gate the planner
    // falls back to a shuffle join — slower, alive.
    val q0 = CachedFrames.cached(queries)
    val nq = q0.count()
    // max over the batch (null-safe): a null head-row vector must not
    // NPE the probe, and max — not an arbitrary first row — is the
    // conservative width for the byte gate
    val dim =
      if (nq == 0) 0L
      else q0.agg(max(coalesce(size(col(qvecCol)), lit(0))).cast("long").as("__d"))
        .head().getLong(0)
    val nqEff = nq * ((dim * 4 + 48) / 40).max(1)
    val base = Tables.spread(corpus, idCol)
      .crossJoin(Dedup.maybeBroadcast(q0, nqEff))
      .where(col(qidCol) =!= col(idCol))
    val joined = extraFilter.fold(base)(base.where)
      .withColumn("cos", cosine(col(qvecCol), col(vecCol)))
    topKFromScores(joined, qidCol, idCol, "cos", k)
  }

  /** Hard-negative mining for contrastive training: for each anchor
    * vector, the top-k most-similar corpus vectors carrying a DIFFERENT
    * label — "hard" because high-cosine wrong-label rows are the
    * gradient-rich negatives a triplet/InfoNCE batch wants (random
    * negatives are trivially separable and teach nothing). The dual of
    * ANN search: same ranking, inverted class constraint.
    *
    * Plan shape = [[bruteForceTopK]]: anchors (with their labels)
    * broadcast, the corpus never shuffles, per-anchor top-k through the
    * O(k)-heap aggregate — with the label-inequality filter applied
    * BEFORE the heap, so same-label rows never enter the shuffle.
    *
    * Null-label contract (SQL `IS DISTINCT FROM` semantics, which is
    * what the differential oracle replays): for a LABELED anchor,
    * null-label corpus rows count as different and stay eligible
    * negatives; for a NULL-LABELED anchor, null-label corpus rows
    * compare EQUAL (null <=> null) and are excluded — "unlabeled" is
    * treated as its own label class on both sides, not as a wildcard.
    * Callers who want unlabeled anchors to range over everything
    * should filter/assign labels upstream.
    *
    * Output: (qidCol, rank, idCol, cos) — the ANN schema. */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
                    labelCol: String,
                    anchors: DataFrame, qidCol: String, qvecCol: String,
                    qlabelCol: String, k: Int): DataFrame =
    broadcastScanTopK(corpus, idCol, vecCol, anchors, qidCol, qvecCol, k,
      Some(!(col(labelCol) <=> col(qlabelCol))))

  /** Two-stage ANN with an int8-quantized first pass: candidate
    * generation scores packed 8-bit codes with an integer dot product
    * (4× less memory traffic than the float scan — at 100 TB the vector
    * scan is bandwidth-bound, so this is the lever), keeps a per-query
    * shortlist, then re-ranks ONLY the shortlist with exact float
    * cosine.
    *
    * Plan shape: queries broadcast, size-gated through
    * `Dedup.maybeBroadcast` (corpus never shuffles) → window
    * top-shortlist per query over (qid, id, score) — the float vectors
    * are NOT carried through that shuffle — → the shortlist (|Q|·s rows,
    * tiny) broadcasts back (gated) against the corpus scan to fetch
    * exact vectors for re-ranking. Two corpus scans, zero corpus shuffles; a
    * production deployment would persist `quantizeCorpus`'s output as
    * its index table and pay only the byte scan per query batch.
    *
    * Ranking uses cosine ≈ (s_q·s_v·dot8) / (|q|·|v|); per query the
    * q-side factors are constant, so the shortlist score is
    * s_v·dot8 / |v|. */
  def bruteForceTopKQuantized(corpus: DataFrame, idCol: String, vecCol: String,
                              queries: DataFrame, qidCol: String, qvecCol: String,
                              k: Int, shortlist: Int = 0): DataFrame = {
    import graft.functions.VectorFunctions.{int8Dot, packInt8}
    val sl = if (shortlist > 0) shortlist else math.max(4 * k, 32)
    val corpusQ = quantizeCorpus(Tables.spread(corpus, idCol), idCol, vecCol)
    // Size-gate every query-batch broadcast through the engine-wide
    // limit (Dedup.maybeBroadcast), exactly like pqShortlistRerank: a
    // forced broadcast() on a corpus-derived query batch (the
    // ScalingCurve / anchors-=-corpus shape) is a silent driver-OOM
    // cliff. Cached so the gate's count and the two query reads
    // (codes + re-rank vectors) don't re-run a derived batch's
    // lineage; byte-equivalent units (bytes/40 — the calibration unit
    // of spark.graft.dedup.maxBroadcastIds) per broadcast payload.
    val q0 = CachedFrames.cached(queries.select(col(qidCol), col(qvecCol)))
    val nq = q0.count()
    val dim =
      if (nq == 0) 0L
      else q0.agg(max(coalesce(size(col(qvecCol)), lit(0))).cast("long").as("__d"))
        .head().getLong(0)
    // packed int8 codes: dim bytes per row; re-rank vectors: dim floats
    val nqCodesEff = nq * ((dim + 48) / 40).max(1)
    val nqVecEff = nq * ((dim * 4 + 48) / 40).max(1)
    val queriesQ = q0
      .select(col(qidCol), col(qvecCol), Quantize.maxAbs(col(qvecCol)).as("__ma"))
      .select(col(qidCol),
        packInt8(Quantize.int8Codes(col(qvecCol), col("__ma"))).as("qcodes"))
    val approx = corpusQ
      .crossJoin(Dedup.maybeBroadcast(queriesQ, nqCodesEff))
      .where(col(qidCol) =!= col(idCol))
      .withColumn("qscore",
        when(col("vnorm") === 0.0, lit(0.0)).otherwise(
          col("vscale") * int8Dot(col("qcodes"), col("codes")).cast("double") / col("vnorm")))
    // shortlist via the O(sl)-heap aggregate, not a window (see
    // topKFromScores)
    val short = topKFromScores(approx, qidCol, idCol, "qscore", sl)
      .select(col(qidCol), col(idCol))
    // gated broadcast join against the corpus scan — the probe +
    // shortlist-only cosine is too light to justify a spread shuffle
    val rerank = corpus
      .join(Dedup.maybeBroadcast(short, nq * sl), Seq(idCol))
      .join(Dedup.maybeBroadcast(q0, nqVecEff), Seq(qidCol))
      .withColumn("cos", cosine(col(qvecCol), col(vecCol)))
    val w = Window.partitionBy(qidCol).orderBy(col("cos").desc, col(idCol).asc)
    rerank
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("cos"))
  }

  /** The quantized index table for [[bruteForceTopKQuantized]]:
    * (idCol, codes: binary, vscale, vnorm). Persist/write this once and
    * the quantized scan never touches the float column. */
  def quantizeCorpus(corpus: DataFrame, idCol: String, vecCol: String): DataFrame = {
    import graft.functions.VectorFunctions.packInt8
    // __ma materialized in its own projection: nested inside the code
    // lambda it would re-evaluate per ELEMENT (see Quantize.int8)
    corpus
      .select(col(idCol), col(vecCol), Quantize.maxAbs(col(vecCol)).as("__ma"))
      .select(col(idCol),
        packInt8(Quantize.int8Codes(col(vecCol), col("__ma"))).as("codes"),
        (col("__ma") / lit(127.0)).as("vscale"),
        sqrt(graft.functions.VectorFunctions.dot(col(vecCol), col(vecCol))).as("vnorm"))
  }

  /** Deterministic pseudo-random hyperplanes: `l` tables × `bits` planes
    * of dimension `dim`, values in [-1, 1) derived from a fixed seed. */
  private[graft] def hyperplanes(dim: Int, bits: Int, l: Int, seed: Long = 42L): Array[Array[Array[Float]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(l, bits, dim)((rnd.nextFloat() * 2f) - 1f)
  }

  /** Sign-bit bucket id of a vector under one table's hyperplanes. */
  private[graft] def bucketCol(vecCol: Column, planes: Array[Array[Float]]): Column = {
    planes.zipWithIndex.map { case (p, i) =>
      val pc = array(p.map(v => lit(v)).toIndexedSeq: _*)
      when(VectorFunctions.dot(vecCol, pc) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Bucket-space sizing for sign-LSH: 2^bits buckets per table,
    * targeting ~`targetOccupancy` vectors per bucket. A FIXED bits is a
    * scale bug: per-bucket occupancy grows linearly with the corpus and
    * the per-bucket self-join quadratically — measured by the x100
    * scaling harness as a 44 GB spill from a 107 MB corpus at bits=8.
    * Scaling bits with log2(n) keeps occupancy (and therefore candidate
    * count per vector) constant. The cost is per-table recall: a true
    * pair at cosine t collides in one table with prob (1-acos(t)/π)^bits,
    * so at the dedup-grade thresholds this operator targets (≥ 0.95,
    * where p ≥ 0.93/bit) even the 20-bit clamp keeps 12-table recall
    * ≥ 0.99; for exploratory low thresholds pass explicit bits/tables. */
  private[graft] def autoBits(n: Long, targetOccupancy: Long = 32L): Int = {
    val buckets = math.max(1L, n / targetOccupancy)
    val b = 64 - java.lang.Long.numberOfLeadingZeros(math.max(0L, buckets - 1))
    math.min(20, math.max(8, b))
  }

  /** All pairs with cosine >= threshold, via multi-table sign-LSH +
    * exact verification. Only candidate pairs (same table, same bucket)
    * are materialized; the exact cosine then prunes false positives.
    *
    * Shuffle discipline (the 100 TB path): the vector rides the bucket
    * rows into the grouped pair enumeration and the exact cosine
    * evaluates bucket-locally, BEFORE the threshold filter and the
    * cross-table distinct ([[Dedup.bucketedSelfPairsScored]]) — the
    * corpus payload is shuffled once per (vector, table) and the only
    * post-bucket shuffle carries verified (id_a, id_b, cos) survivors.
    * The previous formulation kept the bucket exchange id-only and
    * re-joined vectors per candidate side; at the x100 curve point
    * (~29M candidates, 64 floats/vector) those two joins shuffled ~8 GB
    * against the ~700 MB payload-carrying exchange — candidates per
    * vector (occupancy×tables/2 ≈ 150) dwarf the tables× (12) payload
    * duplication, so carrying wins at any occupancy ≫ 2 (same shape as
    * [[Dedup.simhashPairs]]). `maxBucket` drops degenerate buckets
    * (e.g. thousands of all-zero or boilerplate-identical embeddings)
    * whose per-bucket self-join would otherwise go quadratic; with 12
    * independent tables a true near-pair in a dropped bucket is still
    * found by any table where the bucket is not degenerate.
    *
    * `bits = 0` (the default) sizes the bucket space from the corpus
    * count via [[autoBits]] — one extra count() scan, paid only on the
    * auto path. Callers that already know the (approximate) corpus size
    * — a filtered/computed input whose count() would be a full extra
    * job, or a catalog with row statistics — pass it as `expectedCount`
    * to skip that scan entirely; bits only need the magnitude, so a
    * within-2× estimate yields the same bucket sizing ±1 bit. */
  def lshCosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, bits: Int = 0, tables: Int = 12,
                     dim: Int = 64, seed: Long = 42L,
                     maxBucket: Int = Dedup.DefaultMaxBucket,
                     materialize: Boolean = true,
                     expectedCount: Long = -1L): DataFrame = {
    val base = Tables.spread(vectors, idCol).select(col(idCol), col(vecCol))
    // auto path counts `vectors` as passed — callers that pre-spread
    // should size bits from the raw input themselves and pass it
    // explicitly (as Dedup.embeddingCosinePairsLsh does), so the count
    // is a parquet-footer-metadata read rather than a shuffle
    val nBits =
      if (bits > 0) bits
      else autoBits(if (expectedCount >= 0) expectedCount else vectors.count())
    val planes = hyperplanes(dim, nBits, tables, seed)
    // (id, vec, table, bucket) — one row per table per vector; the
    // grouped pair enumeration is the rows' ONLY consumer (the cap is
    // a size() filter inside the same aggregate), so the hyperplane
    // projection runs exactly once and nothing persists. The whole
    // tables×bits projection is ONE fused codegen expression
    // ([[graft.functions.SignLshBuckets]]) — composing it from
    // per-bit dot columns overflowed codegen and fell back to
    // interpreted eval, measured as 92.5 s of a 94 s x100 mining run.
    val bucketRows = base.select(col(idCol), col(vecCol),
      posexplode(graft.functions.VectorFunctions.signLshBuckets(col(vecCol), planes))
        .as(Seq("table_id", "bucket")))
    val out = Dedup.bucketedSelfPairsScored(bucketRows, idCol, vecCol,
        Seq("table_id", "bucket"), maxBucket,
        (a, b) => cosine(a, b),
        _ >= threshold)
      .select(col("id_a"), col("id_b"), col("score").as("cos"))
    if (materialize) Dedup.materializeAndRelease(out) else out
  }

  /** Elementwise-mean aggregate (O(dim) buffers, map-side combine). */
  private lazy val centroidAgg =
    org.apache.spark.sql.functions.udaf(new graft.functions.VectorCentroid,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())

  /** Deterministic `nlist` seed centroid pick as a plan: the rows with
    * the smallest xxhash64(id) — a pseudo-random but reproducible sample
    * that compiles to TakeOrderedAndProject (per-partition partial
    * top-nlist, tiny driver-side merge). No corpus.count() action, no
    * global single-partition Window.orderBy. */
  private[graft] def seedCentroidsPlan(corpus: DataFrame, idCol: String,
                                       vecCol: String, nlist: Int): DataFrame =
    corpus
      .select(col(idCol).cast("long").as("cent_id"), col(vecCol).as("cent_vec"))
      .orderBy(xxhash64(col(idCol)).asc, col(idCol).asc)
      .limit(nlist)

  /** Seed centroids collected to the driver — nlist is tiny, and a
    * driver-resident model is the same shape Spark MLlib's k-means uses
    * (the corpus itself never moves). */
  def seedCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                    nlist: Int): Array[(Long, Array[Float])] =
    seedCentroidsPlan(corpus, idCol, vecCol, nlist)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** [[seedCentroids]] with a PORTABLE pick rule: the `nlist` rows with
    * the smallest md5 of the id's decimal string form (ties by id).
    * Same TakeOrderedAndProject plan as the xxhash64 pick, but an
    * external engine can reproduce the seed set verbatim (`ORDER BY
    * md5(CAST(id AS VARCHAR)), id LIMIT nlist`) — which makes every
    * operator built on the seed model differentially testable
    * end-to-end (used by [[graft.ops.Dedup.semanticDedup]]). */
  def portableSeedCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                            nlist: Int): Array[(Long, Array[Float])] =
    corpus
      .select(col(idCol).cast("long").as("cent_id"), col(vecCol).as("cent_vec"))
      .orderBy(md5(col(idCol).cast("string")).asc, col("cent_id").asc)
      .limit(nlist)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** Nearest-centroid id as a pure column expression: the centroids are
    * inlined as literals and the argmax runs as array_max over
    * (cosine, -id) structs — assignment adds NO join and NO shuffle to
    * the corpus scan. Ties break toward the smaller centroid id. */
  private[graft] def nearestCentId(vecCol: Column, cents: Array[(Long, Array[Float])]): Column =
    element_at(VectorFunctions.nearestCentroids(vecCol, cents, 1), 1)

  /** Lloyd-refined IVF centroids — distributed k-means where each
    * iteration is ONE corpus scan: nearest-centroid assignment is the
    * inlined-literal argmax above (no join, no per-row shuffle), and the
    * cell means come from [[graft.functions.VectorCentroid]] (O(dim)
    * buffers with map-side combine, so the one shuffle carries
    * |nlist| × dim doubles per partition — never vectors). Empty cells
    * keep their previous centroid. Note: distributed float means are
    * partition-order-dependent in the last ulp, so trained centroids are
    * deterministic only up to partitioning (the hash-seeded pick is
    * bit-stable; use that where bit-reproducibility matters). */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      nlist: Int = 16, iterations: Int = 2,
                      trainFraction: Double = 1.0): Array[(Long, Array[Float])] = {
    val trainSet = trainingSet(corpus, idCol, trainFraction)
    var cents = seedCentroids(trainSet, idCol, vecCol, nlist)
    for (_ <- 0 until iterations) {
      val means = Tables.spread(trainSet, idCol)
        .groupBy(nearestCentId(col(vecCol), cents).as("cent_id"))
        .agg(centroidAgg(col(vecCol)).as("cent_vec"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
      cents = cents.map { case (cid, cv) => (cid, means.getOrElse(cid, cv)) }
    }
    cents
  }

  /** The train-on-a-sample dial every Lloyd trainer shares — the
    * standard 100 TB posture: centroid/codebook quality converges on a
    * small deterministic sample (k-means needs ~thousands of points
    * per centroid, not the corpus), so TRAIN on
    * [[Sampling.deterministicSample]] (portable md5-threshold
    * membership — the sample is a pure row predicate, reproducible on
    * any engine) and ASSIGN on everything once. `trainFraction = 1.0`
    * (the default) is byte-for-byte the previous full-corpus behavior.
    * The sample is lineage-truncated so each Lloyd iteration scans the
    * materialized sample, not corpus-scan + re-filter per round —
    * at 1% on 100 TB that is iterations × 1 TB instead of
    * iterations × 100 TB. Measured recall-vs-fraction: SCALING.md
    * round-10 (q115 harness: sampled training matches full-corpus
    * recall at 10%). */
  private def trainingSet(corpus: DataFrame, idCol: String,
                          trainFraction: Double): DataFrame = {
    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"trainFraction must be in (0,1], got $trainFraction")
    if (trainFraction >= 1.0) corpus
    else Checkpointing.truncate(
      Sampling.deterministicSample(corpus, idCol, trainFraction))
  }

  /** IVF top-k: corpus rows are assigned to their nearest centroid once
    * (inlined argmax — the corpus scan gains no join and no shuffle),
    * queries probe the `nprobe` nearest centroid cells, and the
    * candidate join runs on the centroid id. `trainIterations` > 0
    * refines the hash-seeded centroids with that many k-means passes
    * ([[kmeansCentroids]]) for better recall at the same probe cost. */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4,
              trainIterations: Int = 0,
              portableSeeds: Boolean = false,
              trainFraction: Double = 1.0): DataFrame = {
    val cents = ivfCents(corpus, idCol, vecCol, nlist,
      trainIterations, portableSeeds, trainFraction)
    ivfTopKWithProbe(corpus, idCol, vecCol, queries, qidCol, qvecCol,
      k, nprobe,
      assign = v => nearestCentId(v, cents),
      probe = (v, n) => probedCellIds(v, cents, n))
  }

  /** The shared centroid-model branch of every IVF entry point. */
  private def ivfCents(corpus: DataFrame, idCol: String, vecCol: String,
                       nlist: Int, trainIterations: Int,
                       portableSeeds: Boolean,
                       trainFraction: Double = 1.0): Array[(Long, Array[Float])] = {
    val cents =
      if (trainIterations > 0)
        kmeansCentroids(corpus, idCol, vecCol, nlist, trainIterations, trainFraction)
      else if (portableSeeds) portableSeedCentroids(corpus, idCol, vecCol, nlist)
      else seedCentroids(corpus, idCol, vecCol, nlist)
    require(cents.nonEmpty, "IVF needs a non-empty corpus")
    cents
  }

  /** The shared IVF search body — corpus assignment, per-query probe,
    * cell-keyed candidate join, exact in-cell top-k — parameterized by
    * the probe expressions ONLY, so [[ivfTopK]] (flat probe) and
    * [[ivfTopKTwoLevel]] (coarse-quantizer tree) cannot drift: a fix to
    * the join/filter/tail lands on both by construction, which is what
    * keeps the wprobe = ntop ≡ ivfTopK spec meaningful. Probing ranks
    * centroid literals per row (no explode-then-window — it adds no
    * exchange) and the query cells broadcast behind the same
    * byte-equivalent size gate as every other query-batch hint
    * ([[Dedup.maybeBroadcast]]): a corpus-derived query batch falls
    * back to a shuffle join instead of a forced-broadcast driver OOM
    * (the cells carry FULL float vectors — wider rows than even the
    * int8 paths'). */
  private def ivfTopKWithProbe(corpus: DataFrame, idCol: String, vecCol: String,
                               queries: DataFrame, qidCol: String,
                               qvecCol: String, k: Int, nprobe: Int,
                               assign: Column => Column,
                               probe: (Column, Int) => Column): DataFrame = {
    val corpusCells = Tables.spread(corpus, idCol)
      .withColumn("cent_id", assign(col(vecCol)))
    // cached: the gate needs (count, width) and the cell explode reads
    // the same frame — a derived batch must not re-run its lineage
    val q0 = CachedFrames.cached(queries.select(col(qidCol), col(qvecCol)))
    val nq = q0.count()
    val dim =
      if (nq == 0) 0L
      else q0.agg(max(coalesce(size(col(qvecCol)), lit(0))).cast("long").as("__d"))
        .head().getLong(0)
    // ≤ nq·nprobe cell rows, each carrying a dim-float vector
    val cellsEff = nq * nprobe * ((dim * 4 + 48) / 40).max(1)
    val queryCells = q0
      .select(col(qidCol), col(qvecCol),
        explode(probe(col(qvecCol), nprobe)).as("cent_id"))
    val scored = corpusCells.join(Dedup.maybeBroadcast(queryCells, cellsEff), Seq("cent_id"))
      .where(col(qidCol) =!= col(idCol))
      .withColumn("cos", cosine(col(qvecCol), col(vecCol)))
    topKFromScores(scored, qidCol, idCol, "cos", k)
  }

  // --- two-level (coarse-quantizer tree) IVF ---------------------------

  /** Two-level coarse-quantizer model over an existing fine-centroid
    * model: the `ntop` fine centroids with the smallest
    * md5(decimal id string) (ties by id — [[portableSeedCentroids]]'
    * pick rule, so an external engine replays the tree verbatim) become
    * the coarse level, and every fine centroid is assigned to its
    * nearest coarse centroid (cos desc, ties to the smaller coarse id).
    * Built entirely on the DRIVER — the model is nlist × dim floats and
    * the assignment is nlist × ntop dot products; no Spark job runs.
    * Returns (coarse, groups) with groups(i) = the fine members of
    * coarse(i), each group sorted by fine id.
    *
    * Why: the flat probe scores all nlist centroids per row. With the
    * "grow nlist with the corpus" sizing rule (cells stay task-sized),
    * a corpus-sized probe stage is N·nlist — the one envelope the q135
    * SCALING row documents. The tree makes it
    * N·(ntop + wprobe·nlist/ntop): at nlist = 10⁵, ntop = √nlist ≈ 316
    * and wprobe = 4, that is ~1.6k scores per row instead of 10⁵. */
  def twoLevelModel(cents: Array[(Long, Array[Float])], ntop: Int)
      : (Array[(Long, Array[Float])], Array[Array[(Long, Array[Float])]]) = {
    require(cents.nonEmpty, "two-level model needs centroids")
    require(ntop >= 1, s"ntop must be >= 1, got $ntop")
    def md5hex(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val coarse = cents.sortBy { case (id, _) => (md5hex(id), id) }
      .take(math.min(ntop, cents.length))
    // same double-accumulation cosine as the probe expression, so the
    // driver-side assignment and any SQL replay agree bit-for-bit
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < n) {
        val x = a(j).toDouble; val y = b(j).toDouble
        dot += x * y; na += x * x; nb += y * y; j += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else math.max(-1.0, math.min(1.0, dot / (math.sqrt(na) * math.sqrt(nb))))
    }
    val groups = Array.fill(coarse.length)(
      scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])])
    cents.foreach { case (fid, fv) =>
      var best = -1; var bestCos = 0.0
      var i = 0
      while (i < coarse.length) {
        val c = cos(fv, coarse(i)._2)
        if (best < 0 || c > bestCos ||
            (c == bestCos && coarse(i)._1 < coarse(best)._1)) {
          best = i; bestCos = c
        }
        i += 1
      }
      groups(best) += ((fid, fv))
    }
    (coarse, groups.map(_.sortBy(_._1).toArray))
  }

  /** IVF top-k through the coarse-quantizer tree — [[ivfTopK]] with the
    * flat O(nlist) per-row probe replaced by the two-level
    * O(ntop + wprobe·nlist/ntop) probe
    * ([[graft.functions.TwoLevelNearestCentroids]]), on BOTH sides:
    * corpus rows are assigned to the best fine centroid the tree can
    * see (wprobe coarse cells, then argmax over their members) and
    * queries probe the nprobe best fine cells the same way, so
    * assignment and probe stay mutually consistent — the standard
    * hierarchical-IVF approximation (a row whose true cell hides under
    * an unprobed coarse parent lands in the best visible cell instead).
    * wprobe = ntop reproduces [[ivfTopK]] exactly (spec-pinned); the
    * candidate join and top-k tail are shared unchanged. */
  def ivfTopKTwoLevel(corpus: DataFrame, idCol: String, vecCol: String,
                      queries: DataFrame, qidCol: String, qvecCol: String,
                      k: Int, nlist: Int = 16, ntop: Int = 4,
                      wprobe: Int = 2, nprobe: Int = 4,
                      trainIterations: Int = 0,
                      portableSeeds: Boolean = false,
                      trainFraction: Double = 1.0): DataFrame = {
    val cents = ivfCents(corpus, idCol, vecCol, nlist,
      trainIterations, portableSeeds, trainFraction)
    val (coarse, groups) = twoLevelModel(cents, ntop)
    def probe(v: Column, n: Int): Column =
      VectorFunctions.twoLevelNearestCentroids(v, coarse, groups, wprobe, n)
    ivfTopKWithProbe(corpus, idCol, vecCol, queries, qidCol, qvecCol,
      k, nprobe,
      assign = v => element_at(probe(v, 1), 1),
      probe = probe)
  }

  /** IVF × int8: the full 100 TB ANN composition — centroid cells prune
    * the corpus to `nprobe/nlist` of its rows AND the candidate scan
    * inside the probed cells reads packed int8 codes with the integer
    * dot product (4× less memory traffic than floats), then the exact
    * float re-rank touches shortlist rows only. The index table
    * (id, cent_id, codes, vscale, vnorm) is what a deployment persists,
    * bucketed by cent_id; here it is built inline from the corpus. */
  def ivfTopKQuantized(corpus: DataFrame, idCol: String, vecCol: String,
                       queries: DataFrame, qidCol: String, qvecCol: String,
                       k: Int, nlist: Int = 16, nprobe: Int = 4,
                       shortlist: Int = 0,
                       trainIterations: Int = 0,
                       portableSeeds: Boolean = false,
                       trainFraction: Double = 1.0): DataFrame = {
    val cents =
      if (trainIterations > 0)
        kmeansCentroids(corpus, idCol, vecCol, nlist, trainIterations, trainFraction)
      else if (portableSeeds) portableSeedCentroids(corpus, idCol, vecCol, nlist)
      else seedCentroids(corpus, idCol, vecCol, nlist)
    require(cents.nonEmpty, "IVF needs a non-empty corpus")
    // the persistable quantized index, built inline from the corpus
    val index = ivfIndexFrame(corpus, idCol, vecCol, cents)
    val queryCells = quantizedQueryCells(queries, qidCol, qvecCol, cents, nprobe)
    quantizedShortlistRerank(index, queryCells, corpus, idCol, vecCol,
      queries, qidCol, qvecCol, k, shortlist)
  }

  /** Portable PQ codebook: the `ksub` md5-ordered seed rows (same pick
    * rule as [[portableSeedCentroids]]) each contribute their subspace-j
    * slice to subspace j's codebook — so an external engine re-derives
    * the whole model verbatim (`ORDER BY md5(CAST(id AS VARCHAR)), id
    * LIMIT ksub` + list slicing), which is what lets PQ — a doubly
    * approximate method — carry a full differential oracle. `dim` must
    * be divisible by `m`. Lloyd-refined per-subspace codebooks are the
    * production upgrade (same shape as [[kmeansCentroids]]); the seed
    * codebook keeps every downstream bit reproducible. */
  def pqModelPortable(corpus: DataFrame, idCol: String, vecCol: String,
                      m: Int, ksub: Int): graft.functions.PqModel = {
    require(ksub >= 1 && ksub <= 256, s"ksub must fit one byte: $ksub")
    val rows = portableSeedCentroids(corpus, idCol, vecCol, ksub)
    require(rows.nonEmpty, "PQ needs a non-empty corpus")
    val dim = rows(0)._2.length
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val dsub = dim / m
    val codebook = Array.tabulate(m) { j =>
      rows.map { case (_, v) => v.slice(j * dsub, (j + 1) * dsub) }
    }
    graft.functions.PqModel(m, dsub, codebook)
  }

  /** Lloyd-trained PQ codebooks — the production upgrade over the
    * portable seed pick: each iteration is ONE corpus scan that
    * (a) encodes every vector under the current model via the compiled
    * [[graft.functions.PqEncodeCodes]] expression (no join, no per-row
    * shuffle), (b) explodes to (subspace, code, subvector) rows whose
    * map-side partial aggregate collapses each partition to at most
    * m·ksub [[graft.functions.VectorCentroid]] buffers before the one
    * shuffle, and (c) replaces each codebook entry with its cell mean
    * (empty cells keep their previous centroid). Same determinism
    * caveat as [[kmeansCentroids]]: distributed float means are
    * partition-order-dependent in the last ulp, so trained codebooks
    * serve production recall; the [[pqModelPortable]] seed pick stays
    * the bit-reproducible differential-oracle path. */
  def pqModelTrained(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int, ksub: Int,
                     iterations: Int = 2,
                     trainFraction: Double = 1.0): graft.functions.PqModel = {
    import org.apache.spark.sql.GraftSqlShim
    val trainSet = trainingSet(corpus, idCol, trainFraction)
    var model = pqModelPortable(trainSet, idCol, vecCol, m, ksub)
    for (_ <- 0 until iterations) {
      val mm = model
      // codes let-bound in their own projection: element_at inside the
      // explode lambda must read an attribute, not re-run the encoder
      // per subspace (HOF lambdas evaluate their captured trees per
      // element — the Quantize.int8 lesson)
      val enc = Tables.spread(trainSet, idCol)
        .select(col(vecCol).as("__v"),
          GraftSqlShim.column(graft.functions.PqEncodeCodes(
            GraftSqlShim.expression(col(vecCol)), mm)).as("__c"))
      val means = enc
        .select(explode(transform(sequence(lit(0), lit(mm.m - 1)),
            j => struct(j.as("j"),
              element_at(col("__c"), j + 1).as("code"),
              slice(col("__v"), j * mm.dsub + 1, lit(mm.dsub)).as("sub"))))
          .as("e"))
        .groupBy(col("e.j").as("j"), col("e.code").as("code"))
        .agg(centroidAgg(col("e.sub")).as("mean"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Float](2).toArray))
        .toMap
      model = graft.functions.PqModel(mm.m, mm.dsub,
        Array.tabulate(mm.m) { j =>
          Array.tabulate(mm.ksub) { c =>
            means.getOrElse((j, c), mm.codebook(j)(c))
          }
        })
    }
    model
  }

  /** Two-stage PQ-ADC ANN (Jégou et al. 2011): the corpus is encoded
    * once into m-byte codes (the persistable PQ index — 4·D/m× smaller
    * than the float corpus); each query precomputes an m·ksub
    * inner-product table, candidates are scored by O(m) table lookups
    * (ADC) normalized by the stored row norm, and only the per-query
    * shortlist is re-ranked with exact float cosine.
    *
    * Plan shape — identical skeleton to [[bruteForceTopKQuantized]]:
    * queries (with their ADC tables) broadcast against the code scan,
    * per-query shortlist via the O(sl)-heap aggregate (shuffle carries
    * ≤ sl (score, id) entries per query per map partition), shortlist
    * broadcasts back for the exact re-rank. Two corpus scans, zero
    * corpus shuffles; at 100 TB the first scan reads m bytes + one
    * double per row instead of D floats — the memory-bandwidth lever
    * PQ exists for. */
  def pqTopK(corpus: DataFrame, idCol: String, vecCol: String,
             queries: DataFrame, qidCol: String, qvecCol: String,
             k: Int, m: Int = 4, ksub: Int = 16,
             shortlist: Int = 0,
             trainIterations: Int = 0,
             trainFraction: Double = 1.0): DataFrame = {
    val model =
      if (trainIterations > 0)
        pqModelTrained(corpus, idCol, vecCol, m, ksub, trainIterations, trainFraction)
      else pqModelPortable(corpus, idCol, vecCol, m, ksub)
    pqShortlistRerank(
      pqIndexFrame(Tables.spread(corpus, idCol), idCol, vecCol, model), model,
      corpus, idCol, vecCol, queries, qidCol, qvecCol, k, shortlist)
  }

  /** The persistable PQ index rows: (idCol, pqcodes: binary — m bytes,
    * vnorm: double). 4·D/m× smaller than the float corpus; what a
    * deployment stores and byte-scans per query batch. */
  private def pqIndexFrame(corpus: DataFrame, idCol: String, vecCol: String,
                           model: graft.functions.PqModel): DataFrame = {
    import graft.functions.VectorFunctions.pqEncode
    corpus.select(col(idCol),
      pqEncode(col(vecCol), model).as("pqcodes"),
      sqrt(VectorFunctions.dot(col(vecCol), col(vecCol))).as("vnorm"))
  }

  /** Shared tail of the PQ search: ADC candidate scan over a code
    * table (inline or read back from a persisted index) + exact float
    * re-rank of the shortlist. */
  private def pqShortlistRerank(index: DataFrame, model: graft.functions.PqModel,
                                corpus: DataFrame, idCol: String, vecCol: String,
                                queries: DataFrame, qidCol: String, qvecCol: String,
                                k: Int, shortlist: Int): DataFrame = {
    import graft.functions.VectorFunctions.{pqAdcScore, pqDistTable}
    val sl = if (shortlist > 0) shortlist else math.max(4 * k, 32)
    // Size-gate every broadcast through the engine-wide limit
    // (Dedup.maybeBroadcast / spark.graft.dedup.maxBroadcastIds): a
    // forced broadcast() on an unexpectedly large query batch — or its
    // sl × |Q| shortlist — is a silent driver-OOM cliff.
    //
    // The query frame is CACHED first: the gate needs a count and the
    // search reads the frame twice more (ADC tables, the re-rank
    // join) — without it a DERIVED query frame (a filter over the
    // corpus itself, the ScalingCurve shape) would re-run its full
    // lineage for each of the three reads. cache(), not
    // Checkpointing.truncate: under reliable checkpointing truncate
    // would write one never-released stable-storage copy PER SEARCH
    // CALL (cleanCheckpoints is off by default and this call site has
    // no rotation point), while a cached batch is LRU-evicted and
    // keeps its lineage for fault recovery. Registered with
    // CachedFrames so repeated search calls in a long-lived session
    // cannot accumulate CacheManager entries unboundedly.
    val q0 = CachedFrames.cached(queries.select(col(qidCol), col(qvecCol)))
    val nq = q0.count()
    // The engine-wide limit counts ROWS, calibrated for ~40-byte
    // duplicate-id rows (the Dedup workloads it was built for). A
    // queriesT row carries an m·ksub-double ADC table and the re-rank
    // side a dim-float vector, so gate on id-row EQUIVALENTS
    // (bytes / 40): a 5M-row batch of ~2 KB tables (~10 GB) must not
    // pass a 10M-ROW gate.
    val dim = model.m.toLong * model.dsub
    val nqTableEff = nq * ((model.m.toLong * model.ksub * 8 + 48) / 40).max(1)
    val nqVecEff = nq * ((dim * 4 + 48) / 40).max(1)
    val queriesT = q0
      .select(col(qidCol), pqDistTable(col(qvecCol), model).as("__dt"))
    val approx = index
      .crossJoin(Dedup.maybeBroadcast(queriesT, nqTableEff))
      .where(col(qidCol) =!= col(idCol))
      .withColumn("qscore",
        when(col("vnorm") === 0.0, lit(0.0)).otherwise(
          pqAdcScore(col("pqcodes"), col("__dt"), model.ksub) / col("vnorm")))
    val short = topKFromScores(approx, qidCol, idCol, "qscore", sl)
      .select(col(qidCol), col(idCol))
    val rerank = corpus
      .join(Dedup.maybeBroadcast(short, nq * sl), Seq(idCol))
      .join(Dedup.maybeBroadcast(q0, nqVecEff), Seq(qidCol))
      .withColumn("cos", cosine(col(qvecCol), col(vecCol)))
    val w = Window.partitionBy(qidCol).orderBy(col("cos").desc, col(idCol).asc)
    rerank
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("cos"))
  }

  /** Build the PQ code table ONCE and persist it — the deployment
    * shape: encoding (the only pass that touches float vectors) runs
    * at build time; every later query batch byte-scans the code table.
    * Unlike the IVF index there is no pruning dimension — ADC reads
    * every code row — so the table is bucketed by id only to keep the
    * append layout lawful and id-keyed fetches co-located. Returns the
    * codebook model to store next to the table (m·ksub·D/m floats). */
  def writePqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                   tableName: String, m: Int = 16, ksub: Int = 16,
                   numBuckets: Int = 16): graft.functions.PqModel = {
    val model = pqModelPortable(corpus, idCol, vecCol, m, ksub)
    writePqIndexWith(corpus, idCol, vecCol, tableName, model, numBuckets)
    model
  }

  /** [[writePqIndex]] with a PINNED codebook — the rebuild path and the
    * base case appends grow from. */
  def writePqIndexWith(corpus: DataFrame, idCol: String, vecCol: String,
                       tableName: String, model: graft.functions.PqModel,
                       numBuckets: Int = 16): Unit =
    Bucketing.writeBucketed(pqIndexFrame(corpus, idCol, vecCol, model),
      tableName, idCol, numBuckets)

  /** Encode new vectors under the index's OWN codebook and append —
    * same model contract as [[appendToIvfIndex]]: an index is
    * (table, model) as a pair, and appends never move the codebook, so
    * distribution drift degrades quantization error over time; rebuild
    * with a fresh model on the occupancy/recall signal. */
  def appendToPqIndex(newCorpus: DataFrame, idCol: String, vecCol: String,
                      tableName: String, model: graft.functions.PqModel,
                      numBuckets: Int = 16): Unit =
    Bucketing.appendBucketedBy(pqIndexFrame(newCorpus, idCol, vecCol, model),
      tableName, numBuckets, Seq(idCol))

  /** Query a [[writePqIndex]]-persisted code table: the float corpus is
    * touched only by the shortlist re-rank fetch. */
  def pqTopKFromIndex(spark: SparkSession, tableName: String,
                      model: graft.functions.PqModel,
                      corpus: DataFrame, idCol: String, vecCol: String,
                      queries: DataFrame, qidCol: String, qvecCol: String,
                      k: Int, shortlist: Int = 0): DataFrame =
    pqShortlistRerank(spark.table(tableName), model,
      corpus, idCol, vecCol, queries, qidCol, qvecCol, k, shortlist)

  /** The persistable IVF×int8 index rows:
    * (idCol, cent_id, codes, vscale, vnorm [, extraCols…]).
    * `extraCols` ride along unchanged — the labeled-index shape
    * [[hardNegativesFromIndex]] needs (filters that must run BEFORE
    * the candidate heap can only see columns the index itself
    * carries). */
  private def ivfIndexFrame(corpus: DataFrame, idCol: String, vecCol: String,
                            cents: Array[(Long, Array[Float])],
                            extraCols: Seq[String] = Nil): DataFrame = {
    import graft.functions.VectorFunctions.packInt8
    Tables.spread(corpus, idCol)
      .select(col(idCol) +: col(vecCol) +: Quantize.maxAbs(col(vecCol)).as("__ma") +:
        extraCols.map(col): _*)
      .select(
        col(idCol) +:
        nearestCentId(col(vecCol), cents).as("cent_id") +:
        packInt8(Quantize.int8Codes(col(vecCol), col("__ma"))).as("codes") +:
        (col("__ma") / lit(127.0)).as("vscale") +:
        sqrt(graft.functions.VectorFunctions.dot(col(vecCol), col(vecCol))).as("vnorm") +:
        extraCols.map(col): _*)
  }

  /** The `nprobe` nearest centroid ids for one query vector as a pure
    * per-row expression: rank the inlined centroid literals with
    * array_sort over (-cosine, cent_id) structs — cos desc, ties to the
    * smaller cent_id — and slice. No explode-then-window, so probing
    * adds NO exchange to the query side (the old window formulation
    * shuffled the query vectors on qid just to rank nlist literals). */
  private[graft] def probedCellIds(qvecCol: Column,
                            cents: Array[(Long, Array[Float])],
                            nprobe: Int): Column =
    VectorFunctions.nearestCentroids(qvecCol, cents, nprobe)

  /** Per-query probed cells with the quantized query codes:
    * (qidCol, qcodes, cent_id [, extraCols…]), `nprobe` rows per
    * query. */
  private def quantizedQueryCells(queries: DataFrame, qidCol: String,
                                  qvecCol: String,
                                  cents: Array[(Long, Array[Float])],
                                  nprobe: Int,
                                  extraCols: Seq[String] = Nil,
                                  probe: Option[(Column, Int) => Column] = None)
      : DataFrame = {
    import graft.functions.VectorFunctions.packInt8
    val p = probe.getOrElse((v: Column, n: Int) => probedCellIds(v, cents, n))
    queries
      .select(col(qidCol) +: col(qvecCol) +: Quantize.maxAbs(col(qvecCol)).as("__ma") +:
        extraCols.map(col): _*)
      .select(col(qidCol) +:
        packInt8(Quantize.int8Codes(col(qvecCol), col("__ma"))).as("qcodes") +:
        explode(p(col(qvecCol), nprobe)).as("cent_id") +:
        extraCols.map(col): _*)
  }

  /** The per-anchor probe expression for an index search: flat
    * ([[probedCellIds]], O(nlist) per row) or, when `treeProbe =
    * Some((ntop, wprobe))`, the coarse-quantizer tree
    * (O(ntop + wprobe·nlist/ntop) — the q145 fix, carried into the
    * DEPLOYMENT path where it matters most: index PROBING recurs per
    * anchor batch forever, and anchors = corpus makes it N·nlist,
    * while the index build's flat assignment is one-time and amortized
    * over every later query). wprobe = ntop reproduces the flat probe
    * exactly (spec-pinned); narrower is the standard hierarchical
    * approximation with the measured wprobe dial (SCALING.md). */
  private def indexProbeFn(cents: Array[(Long, Array[Float])],
                           treeProbe: Option[(Int, Int)])
      : (Column, Int) => Column =
    treeProbe match {
      case Some((ntop, wprobe)) =>
        val (coarse, groups) = twoLevelModel(cents, ntop)
        (v: Column, n: Int) =>
          VectorFunctions.twoLevelNearestCentroids(v, coarse, groups, wprobe, n)
      case None =>
        (v: Column, n: Int) => probedCellIds(v, cents, n)
    }

  /** Shared tail of the quantized-IVF search: integer-dot candidate scan
    * inside the probed cells → per-query shortlist → exact float re-rank
    * on shortlist rows only. The index side is never shuffled (query
    * cells and shortlists broadcast). */
  private def quantizedShortlistRerank(index: DataFrame, queryCells: DataFrame,
                                       corpus: DataFrame, idCol: String,
                                       vecCol: String, queries: DataFrame,
                                       qidCol: String, qvecCol: String,
                                       k: Int, shortlist: Int): DataFrame = {
    import graft.functions.VectorFunctions.int8Dot
    val sl = if (shortlist > 0) shortlist else math.max(4 * k, 32)
    // Size-gate all three query-batch broadcasts through the
    // engine-wide limit (Dedup.maybeBroadcast), like pqShortlistRerank:
    // a corpus-derived query batch (anchors = corpus) would otherwise
    // force-broadcast straight into a driver OOM. Both frames cached —
    // the gate needs counts, and the cell table is read by the
    // candidate join while the vector frame is read by the re-rank.
    // Byte-equivalent units (bytes/40, the calibration unit of
    // spark.graft.dedup.maxBroadcastIds) per broadcast payload.
    val q0 = CachedFrames.cached(queries.select(col(qidCol), col(qvecCol)))
    val nq = q0.count()
    val dim =
      if (nq == 0) 0L
      else q0.agg(max(coalesce(size(col(qvecCol)), lit(0))).cast("long").as("__d"))
        .head().getLong(0)
    val qc0 = CachedFrames.cached(queryCells)
    // |Q|·nprobe rows, each carrying dim packed-int8 code bytes
    val cellsEff = qc0.count() * ((dim + 48) / 40).max(1)
    val nqVecEff = nq * ((dim * 4 + 48) / 40).max(1)
    val short = topKFromScores(
      index.join(Dedup.maybeBroadcast(qc0, cellsEff), Seq("cent_id"))
        .where(col(qidCol) =!= col(idCol))
        .withColumn("qscore",
          when(col("vnorm") === 0.0, lit(0.0)).otherwise(
            col("vscale") * int8Dot(col("qcodes"), col("codes")).cast("double") / col("vnorm"))),
      qidCol, idCol, "qscore", sl)
      .select(col(qidCol), col(idCol))

    val w = Window.partitionBy(qidCol).orderBy(col("cos").desc, col(idCol).asc)
    corpus
      .join(Dedup.maybeBroadcast(short, nq * sl), Seq(idCol))
      .join(Dedup.maybeBroadcast(q0, nqVecEff), Seq(qidCol))
      .withColumn("cos", cosine(col(qvecCol), col(vecCol)))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("cos"))
  }

  /** Build the IVF×int8 index ONCE and persist it as a parquet table
    * bucketed (and sorted) by `cent_id` — the deployment shape: the
    * expensive centroid assignment + quantization scan runs at build
    * time, and every later query batch reads back only the probed
    * cells' buckets. Returns the centroid model to hand to
    * [[ivfTopKQuantizedFromIndex]] (a deployment stores it next to the
    * table — nlist × dim floats). */
  def writeIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    tableName: String, nlist: Int = 16, numBuckets: Int = 16,
                    trainIterations: Int = 0,
                    trainFraction: Double = 1.0): Array[(Long, Array[Float])] = {
    val cents =
      if (trainIterations > 0)
        kmeansCentroids(corpus, idCol, vecCol, nlist, trainIterations, trainFraction)
      else seedCentroids(corpus, idCol, vecCol, nlist)
    require(cents.nonEmpty, "IVF needs a non-empty corpus")
    writeIvfIndexWith(corpus, idCol, vecCol, tableName, cents, numBuckets)
    cents
  }

  /** [[writeIvfIndex]] with a PINNED centroid model — the rebuild path
    * (re-lay-out an index under the model it already serves) and the
    * base case appends grow from. */
  def writeIvfIndexWith(corpus: DataFrame, idCol: String, vecCol: String,
                        tableName: String, cents: Array[(Long, Array[Float])],
                        numBuckets: Int = 16,
                        extraCols: Seq[String] = Nil): Unit = {
    require(cents.nonEmpty, "IVF needs a non-empty centroid model")
    Bucketing.writeBucketed(ivfIndexFrame(corpus, idCol, vecCol, cents, extraCols),
      tableName, "cent_id", numBuckets, sortCol = Some("cent_id"))
  }

  /** Absorb new vectors into a [[writeIvfIndex]]-persisted index
    * without rewriting it: assign + quantize the NEW rows under the
    * index's OWN centroid model (`cents` must be the model returned at
    * build time — an index is (table, model) as a pair) and append them
    * into the cent_id-bucketed table; bucket pruning and the
    * exchange-free probe keep working over old + new rows.
    *
    * Centroid-drift policy: appends never move the centroids, so as the
    * appended distribution drifts from the model, cells imbalance and
    * recall at fixed nprobe decays. The deployment signal is the cell
    * occupancy histogram (one groupBy(cent_id).count over the index —
    * bucketed, no shuffle); when the max/median ratio degrades, rebuild
    * with [[writeIvfIndex]] (fresh or `trainIterations`-refined model)
    * — the same periodic-retrain policy every IVF deployment carries. */
  def appendToIvfIndex(newCorpus: DataFrame, idCol: String, vecCol: String,
                       tableName: String, cents: Array[(Long, Array[Float])],
                       numBuckets: Int = 16,
                       extraCols: Seq[String] = Nil): Unit = {
    require(cents.nonEmpty, "IVF needs a non-empty centroid model")
    Bucketing.appendBucketedBy(ivfIndexFrame(newCorpus, idCol, vecCol, cents, extraCols),
      tableName, numBuckets, Seq("cent_id"), Seq("cent_id"))
  }

  /** Query a [[writeIvfIndex]]-persisted index. The probed cell ids are
    * resolved driver-side (at most nlist longs — the same tiny-model
    * contract as the centroids themselves) and pushed into the scan as
    * a literal IN predicate, so the bucketed index table is read with
    * bucket pruning: only the probed cells' buckets come off storage,
    * the index is never shuffled (query cells and shortlists
    * broadcast), and the exact re-rank touches shortlist rows only.
    * `corpus` supplies the float vectors for the re-rank — the same
    * corpus the index was built from. */
  def ivfTopKQuantizedFromIndex(spark: SparkSession, tableName: String,
                                cents: Array[(Long, Array[Float])],
                                corpus: DataFrame, idCol: String, vecCol: String,
                                queries: DataFrame, qidCol: String, qvecCol: String,
                                k: Int, nprobe: Int = 4,
                                shortlist: Int = 0,
                                treeProbe: Option[(Int, Int)] = None): DataFrame = {
    val probeFn = indexProbeFn(cents, treeProbe)
    // materialize the (small: nprobe rows per query) cell table once —
    // the driver-side probed-cell collect AND the shortlist join both
    // read it, and without truncation the second use would re-run the
    // query quantization + centroid probing as a second Spark job
    val queryCells = Checkpointing.truncate(
      quantizedQueryCells(queries, qidCol, qvecCol, cents, nprobe,
        probe = Some(probeFn)))
    val probed = queryCells.select("cent_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val index = spark.table(tableName)
      .where(col("cent_id").isin(probed.map(Long.box).toIndexedSeq: _*))
    quantizedShortlistRerank(index, queryCells, corpus, idCol, vecCol,
      queries, qidCol, qvecCol, k, shortlist)
  }

  /** CORPUS-SCALE hard-negative mining over a LABELED IVF×int8 index —
    * the indexed upgrade of [[hardNegatives]]: contrastive-training
    * prep mines negatives for EVERY corpus row (anchors = corpus),
    * where the exact miner's broadcast scan is O(N²) and its anchor
    * broadcast a driver cliff. Here each anchor scans only its
    * `nprobe`/nlist probed cells' int8 codes, the different-label
    * filter runs BEFORE the O(sl) shortlist heap (same-label rows
    * never enter the shuffle — the index carries the label for exactly
    * this reason), and only the shortlist is re-ranked in exact float.
    *
    * `index` is a labeled index frame: [[writeIvfIndexWith]] with
    * `extraCols = Seq(labelCol)` (read back via `spark.table` —
    * cent_id-bucketed, so the candidate join shuffles only the anchor
    * cells), or an inline [[hardNegativesQuantized]] build.
    *
    * Plan posture (vs the small-batch search paths): NOTHING here is
    * force-broadcast. Anchor cells, shortlist, and the re-rank's
    * anchor vectors route through the engine-wide size gate in id-row
    * byte equivalents — batch-sized anchors broadcast exactly like
    * [[hardNegatives]]; corpus-sized anchors fall back to key-keyed
    * shuffle joins against the bucket-local index, which is the honest
    * N·(nprobe/nlist)·|cell| candidate plan. Null-label contract =
    * [[hardNegatives]] (IS DISTINCT FROM semantics).
    *
    * Output: (qidCol, rank, idCol, cos) — the ANN schema. */
  def hardNegativesFromIndex(index: DataFrame,
                             cents: Array[(Long, Array[Float])],
                             corpus: DataFrame, idCol: String, vecCol: String,
                             labelCol: String,
                             anchors: DataFrame, qidCol: String, qvecCol: String,
                             qlabelCol: String, k: Int,
                             nprobe: Int = 4, shortlist: Int = 0,
                             treeProbe: Option[(Int, Int)] = None): DataFrame = {
    import graft.functions.VectorFunctions.int8Dot
    require(cents.nonEmpty, "IVF needs a non-empty centroid model")
    require(index.columns.contains(labelCol),
      s"index must carry the label column '$labelCol' — build it with " +
        s"writeIvfIndexWith(..., extraCols = Seq(\"$labelCol\"))")
    require(labelCol != qlabelCol && qidCol != idCol && qvecCol != vecCol,
      "anchor columns must be renamed apart from corpus/index columns " +
        s"(got labelCol='$labelCol' qlabelCol='$qlabelCol', " +
        s"idCol='$idCol' qidCol='$qidCol', vecCol='$vecCol' qvecCol='$qvecCol') " +
        "— the candidate and re-rank joins carry both sides")
    val sl = if (shortlist > 0) shortlist else math.max(4 * k, 32)
    val dim = cents(0)._2.length.toLong
    val a0 = CachedFrames.cached(
      anchors.select(col(qidCol), col(qvecCol), col(qlabelCol)))
    val nq = a0.count()
    // probed-cell pushdown (≤ nlist longs): resolved from a LIGHT
    // projection — anchors may be corpus-sized, so materializing the
    // full (qcodes, label) cell stream just to take distinct cent_ids
    // would be a corpus-sized checkpoint; the light pass re-runs only
    // the probe ranking
    val probeFn = indexProbeFn(cents, treeProbe)
    val probed = a0
      .select(explode(probeFn(col(qvecCol), nprobe)).as("cent_id"))
      .distinct().collect().map(_.getLong(0)).sorted
    val pruned = index.where(col("cent_id").isin(probed.map(Long.box).toIndexedSeq: _*))
    val queryCells = quantizedQueryCells(a0, qidCol, qvecCol, cents, nprobe,
      extraCols = Seq(qlabelCol), probe = Some(probeFn))
    // gate units: one cell row ≈ dim code bytes + id/label overhead
    val cellsEff = nq * nprobe.toLong * ((dim + 64) / 40).max(1)
    val cand = pruned
      .join(Dedup.maybeBroadcast(queryCells, cellsEff), Seq("cent_id"))
      .where(col(qidCol) =!= col(idCol))
      .where(!(col(labelCol) <=> col(qlabelCol))) // pre-heap label filter
      .withColumn("qscore",
        when(col("vnorm") === 0.0, lit(0.0)).otherwise(
          col("vscale") * int8Dot(col("qcodes"), col("codes")).cast("double") / col("vnorm")))
    val short = topKFromScores(cand, qidCol, idCol, "qscore", sl)
      .select(col(qidCol), col(idCol))
    val w = Window.partitionBy(qidCol).orderBy(col("cos").desc, col(idCol).asc)
    corpus
      .join(Dedup.maybeBroadcast(short, nq * sl), Seq(idCol))
      .join(Dedup.maybeBroadcast(a0.select(col(qidCol), col(qvecCol)),
        nq * ((dim * 4 + 48) / 40).max(1)), Seq(qidCol))
      .withColumn("cos", cosine(col(qvecCol), col(vecCol)))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("cos"))
  }

  /** [[hardNegativesFromIndex]] with the labeled index built inline
    * from the corpus — the one-shot shape (and the differential-oracle
    * entry point: `portableSeeds` makes every stage replayable). */
  def hardNegativesQuantized(corpus: DataFrame, idCol: String, vecCol: String,
                             labelCol: String,
                             anchors: DataFrame, qidCol: String, qvecCol: String,
                             qlabelCol: String, k: Int,
                             nlist: Int = 16, nprobe: Int = 4,
                             shortlist: Int = 0,
                             trainIterations: Int = 0,
                             portableSeeds: Boolean = false,
                             trainFraction: Double = 1.0): DataFrame = {
    val cents =
      if (trainIterations > 0)
        kmeansCentroids(corpus, idCol, vecCol, nlist, trainIterations, trainFraction)
      else if (portableSeeds) portableSeedCentroids(corpus, idCol, vecCol, nlist)
      else seedCentroids(corpus, idCol, vecCol, nlist)
    require(cents.nonEmpty, "IVF needs a non-empty corpus")
    hardNegativesFromIndex(
      ivfIndexFrame(corpus, idCol, vecCol, cents, extraCols = Seq(labelCol)),
      cents, corpus, idCol, vecCol, labelCol,
      anchors, qidCol, qvecCol, qlabelCol, k, nprobe, shortlist)
  }
}
