package graft

import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, Dedup, RangeJoin, Similarity, TextOps}
import graft.functions.VectorFunctions

/** Unit semantics for the analytics/ML ops on small hand-built inputs. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks the latest right row at or before the left time") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 20L, 50L))
      .toDF("id", "key", "t")
    val right = Seq((10L, 100L, "a"), (10L, 200L, "b"), (10L, 200L, "b2"), (20L, 60L, "c"))
      .toDF("rkey", "rt", "payload")
    val out = AsOfJoin.asof(left, right, "key", "rkey", "t", "rt",
        Seq("payload"), rightTieBreak = Some("payload"))
      .select("id", "payload").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("a"))   // rt=100 <= t=100 (inclusive)
    assert(out(2L).contains("b2"))  // tie at rt=200 → max tie-break
    assert(out(3L).isEmpty)         // no right row at or before t=50
  }

  test("planned asof join (custom strategy) matches the window formulation") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 20L, 50L), (4L, 10L, 300L))
      .toDF("id", "key", "t")
    val right = Seq((10L, 100L, "a"), (10L, 200L, "b"), (10L, 200L, "b2"), (20L, 60L, "c"))
      .toDF("rkey", "rt", "payload")
    val windowed = AsOfJoin.asof(left, right, "key", "rkey", "t", "rt",
        Seq("payload"), Some("payload"))
      .select("id", "payload").as[(Long, Option[String])].collect().toMap
    val planned = AsOfJoin.asofPlanned(left, right, "key", "rkey", "t", "rt",
        Seq("payload"))
      .select("id", "payload").as[(Long, Option[String])].collect().toMap
    assert(planned == windowed)
    assert(planned(2L).contains("b2")) // tie at rt=200 → lexicographic max
    assert(planned(3L).isEmpty)
  }

  test("planned asof join matches windowed asof on the fixture tables") {
    val events = graft.ops.Tables.table(spark, sf, "events")
      .select("event_id", "user_id", "ts")
    val orders = graft.ops.Tables.table(spark, sf, "orders")
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    val windowed = AsOfJoin.asof(events, orders, "user_id", "o_custkey",
        "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"), Some("o_orderkey"))
      .select("event_id", "o_orderkey").as[(Long, Option[Long])].collect().toMap
    val planned = AsOfJoin.asofPlanned(events, orders, "user_id", "o_custkey",
        "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"))
      .select("event_id", "o_orderkey").as[(Long, Option[Long])].collect().toMap
    assert(planned.size == windowed.size)
    val diffs = windowed.collect { case (k, v) if planned(k) != v => (k, v, planned(k)) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
  }

  test("cosine expression matches the HOF formulation and handles zero vectors") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)))
      .toDF("id", "a", "b")
    val rows = df.select(col("id"),
        VectorFunctions.cosine(col("a"), col("b")).as("expr_cos"),
        Similarity.cosineHof(col("a"), col("b")).as("hof_cos"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(1L)._1 == 0.0)
    assert(math.abs(rows(2L)._1 - 1.0) < 1e-12)
    assert(rows(3L)._1 == 0.0, "zero vector → 0.0, not NaN")
    rows.values.foreach { case (e, h) => assert(math.abs(e - h) < 1e-12) }
  }

  test("brute-force topK returns the true nearest neighbors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val queries = vecs.where(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        queries, "qid", "qvec", k = 2)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("lsh cosine pairs finds planted near-duplicates") {
    val base = Array.tabulate(64)(i => math.sin(i).toFloat)
    val nearDup = base.clone(); nearDup(0) = base(0) + 0.001f
    val far = Array.tabulate(64)(i => math.cos(i * 3).toFloat)
    val df = Seq((0L, base), (1L, nearDup), (2L, far)).toDF("id", "vec")
    val pairs = Similarity.lshCosinePairs(df, "id", "vec", threshold = 0.99, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("exact dedup keeps one representative per identical text") {
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("duplicate-id anti-joins: broadcast below the conf limit, shuffle above") {
    val docs = (1L to 40L).map(i => (i, s"document number $i")).toDF("id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    def planOf(limit: Option[String]): String = {
      // autoBroadcastJoinThreshold=-1 keeps AQE from re-broadcasting the
      // tiny test-side on its own, so the assertion sees the HINT's
      // effect; at scale that runtime conversion is exactly the desired
      // behavior and stays available
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      limit.foreach(spark.conf.set(Dedup.MaxBroadcastIdsKey, _))
      try {
        val kept = Dedup.keepRepresentatives(docs, "id", pairs)
        kept.collect()
        kept.queryExecution.executedPlan.toString
      } finally {
        spark.conf.unset(Dedup.MaxBroadcastIdsKey)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    val bc = planOf(None)
    assert(bc.contains("BroadcastHashJoin") && bc.contains("LeftAnti"),
      s"expected a hinted broadcast anti-join below the limit:\n$bc")
    val sh = planOf(Some("0"))
    assert(!sh.contains("BroadcastHashJoin") && sh.contains("LeftAnti"),
      s"expected a hint-free shuffle anti-join above the limit:\n$sh")
    // values identical either way
    assert(planOf(None).nonEmpty) // plans differ; results must not
    def keptIds(limit: Option[String]): Seq[Long] = {
      limit.foreach(spark.conf.set(Dedup.MaxBroadcastIdsKey, _))
      try Dedup.keepRepresentatives(docs, "id", pairs)
        .select("id").as[Long].collect().sorted.toSeq
      finally spark.conf.unset(Dedup.MaxBroadcastIdsKey)
    }
    assert(keptIds(None) == keptIds(Some("0")))
  }

  test("semanticDedup diverse keep: all three dup-sized joins obey the broadcast limit") {
    val corpus = (1 to 30).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0.01f * i, 0f) else Array(0f, 1f, 0.01f * i)
      (i.toLong, base)
    }.toDF("id", "vec")
    def planOf(limit: Option[String]): String = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      limit.foreach(spark.conf.set(Dedup.MaxBroadcastIdsKey, _))
      try {
        val out = Dedup.semanticDedup(corpus, "id", "vec", nlist = 2,
          tau = 0.9, keep = "diverse")
        out.collect()
        out.queryExecution.executedPlan.toString
      } finally {
        spark.conf.unset(Dedup.MaxBroadcastIdsKey)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    assert(planOf(None).contains("BroadcastHashJoin"))
    val sh = planOf(Some("0"))
    assert(!sh.contains("BroadcastHashJoin") && sh.contains("LeftAnti"),
      s"expected all dup-sized joins hint-free above the limit:\n$sh")
  }

  test("snapshotManifest: order-free, and any row loss/dup/corruption moves a digest") {
    import graft.ops.Layout
    val docs = (1L to 40L).map(i => (i, s"payload number $i"))
      .toDF("id", "text")
    def manifest(df: org.apache.spark.sql.DataFrame): Map[Int, (Long, String)] =
      Layout.snapshotManifest(df, col("id") % 4,
          concat_ws("\u0001", col("id"), col("text")))
        .as[(Int, Long, String)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    val base = manifest(docs)
    // order/partitioning invariance: the commutative digest is the point
    assert(manifest(docs.repartition(7, col("text"))) == base)
    assert(manifest(docs.orderBy(col("id").desc)) == base)
    // a lost row, a duplicated row, and a bit-flip each move the digest
    val lost = manifest(docs.where(col("id") =!= 8L))
    assert(lost(0) != base(0) && lost(1) == base(1))
    val dup = manifest(docs.unionAll(docs.where(col("id") === 8L)))
    assert(dup(0)._1 == base(0)._1 + 1 && dup(0)._2 != base(0)._2)
    val corrupt = manifest(docs.withColumn("text",
      when(col("id") === 9L, lit("payload number 9!")).otherwise(col("text"))))
    assert(corrupt(1) != base(1) && corrupt(0) == base(0))
    // the write path certifies what landed: manifest-from-disk == direct
    val out = java.nio.file.Files.createTempDirectory("snapman").toString
    val written = Layout.writeSnapshotWithManifest(docs, col("id") % 4,
        b => concat_ws("\u0001", b("id"), b("text")), out)
      .as[(Int, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(written == base)
    graft.ops.LocalFiles.deleteRecursively(out)
  }

  test("advanceCCStateTable: incremental labels equal the from-scratch CC") {
    val st = "ccadv_spec_state"
    graft.ops.Tables.dropTablesAndDirs(spark, st, s"${st}__next", s"${st}__old")
    // batch 1: {1,2}, {5,6}, {10,11} ; batch 2 MERGES {1,2}+{5,6} via
    // (2,5), extends {1,..} with a new node 3, adds a brand-new
    // cluster {20,21}; {10,11} stays untouched
    val b1 = Seq((1L, 2L), (5L, 6L), (10L, 11L)).toDF("id_a", "id_b")
    val b2 = Seq((2L, 5L), (1L, 3L), (20L, 21L)).toDF("id_a", "id_b")
    Dedup.connectedComponents(b1).write.saveAsTable(st)
    Dedup.advanceCCStateTable(spark, st, b2)
    val got = spark.table(st).as[(Long, Long)].collect().toMap
    val full = Dedup.connectedComponents(b1.unionAll(b2))
      .as[(Long, Long)].collect().toMap
    assert(got == full, s"incremental $got must equal from-scratch $full")
    // and concretely: the merged component took the global min label,
    // the untouched cluster kept its rows, the new cluster appeared
    assert(got(6L) == 1L && got(3L) == 1L)
    assert(got(10L) == 10L && got(11L) == 10L)
    assert(got(21L) == 20L)
    graft.ops.Tables.dropTablesAndDirs(spark, st)
  }

  test("embeddingCosinePairs: cross-join broadcast gated by the conf limit") {
    // evens share one axis (cos = 1 pairs), odds another — nonempty output
    val corpus = (1L to 12L).map { i =>
      val v = if (i % 2 == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, 0f)
      (i, v)
    }.toDF("id", "vec")
    def run(limit: Option[String]): (String, Seq[(Long, Long)]) = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      limit.foreach(spark.conf.set(Dedup.MaxBroadcastIdsKey, _))
      try {
        val out = Dedup.embeddingCosinePairs(corpus, "id", "vec", 0.99,
          expectedCount = 12L, dim = 4)
        val rows = out.select("id_a", "id_b").as[(Long, Long)]
          .collect().sorted.toSeq
        (out.queryExecution.executedPlan.toString, rows)
      } finally {
        spark.conf.unset(Dedup.MaxBroadcastIdsKey)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    val (bc, rowsBc) = run(None)
    assert(bc.contains("BroadcastNestedLoopJoin"),
      s"expected the hinted broadcast cross join below the limit:\n$bc")
    val (sh, rowsSh) = run(Some("0"))
    assert(!sh.contains("BroadcastNestedLoopJoin"),
      s"expected a hint-free join above the limit:\n$sh")
    assert(rowsBc.nonEmpty && rowsBc == rowsSh,
      "identical pairs in both modes")
  }

  test("minhash-LSH finds high-jaccard pairs and skips low ones") {
    val a = (1 to 40).map(i => s"tok$i").mkString(" ")
    val b = (1 to 38).map(i => s"tok$i").mkString(" ") + " tokX tokY" // ~0.9 jaccard
    val c = (100 to 140).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = Dedup.minhashJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash: identical texts collide, dissimilar texts are far") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog"),
        (3L, "entirely different content about spark aggregation plans"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("langId picks the language whose stopwords dominate") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it is warm"),
      (2L, "el gato que corre en la casa y el perro"),
      (3L, "der hund und die katze in das haus"),
      (4L, "xyzzy qwerty plugh")) // no stopwords at all
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), TextOps.langId(col("text")).as("lang"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en"); assert(out(2L) == "es")
    assert(out(3L) == "de"); assert(out(4L) == "und")
  }

  test("quality score separates natural text from garbage") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs into the field with joy"),
      (2L, "@@@@ #### $$$$ 1234 !!!! %%%% ^^^^ &&&&"))
      .toDF("doc_id", "text")
    val q = docs.select(col("doc_id"), TextOps.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(q(1L) > 0.7 && q(2L) < 0.65 && q(1L) > q(2L) + 0.15,
      s"expected separation, got $q")
  }

  test("fingerprints are deterministic and order-sensitive") {
    val docs = Seq((1L, "abc def"), (2L, "abc def"), (3L, "def abc"))
      .toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"), TextOps.rollingHash(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("ivf topK recall vs brute force on the fixture embeddings") {
    val emb = graft.ops.Tables.table(spark, sf, "embeddings")
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, "qid", "qvec", 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", queries, "qid", "qvec", 5,
        nlist = 8, nprobe = 4)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall collapsed: $recall")
  }

  test("two-level probe: wprobe = ntop reproduces the flat probe exactly") {
    val emb = graft.ops.Tables.table(spark, sf, "embeddings")
    val cents = Similarity.portableSeedCentroids(emb, "vec_id", "embedding", 16)
    val (coarse, groups) = Similarity.twoLevelModel(cents, 4)
    // model sanity: groups partition the fine set; coarse = the 4
    // md5-smallest fine ids (the portable pick over the seed set)
    assert(groups.map(_.length).sum == cents.length)
    assert(groups.flatMap(_.map(_._1)).sorted.toSeq ==
      cents.map(_._1).sorted.toSeq)
    def md5hex(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(coarse.map(_._1).toSeq ==
      cents.sortBy { case (id, _) => (md5hex(id), id) }.take(4).map(_._1).toSeq)
    // probing EVERY coarse cell makes the candidate set the full fine
    // set → the tree must equal the flat probe bit-for-bit (ids AND
    // scores), on every fixture vector
    import graft.functions.VectorFunctions
    val both = emb.select(
        VectorFunctions.nearestCentroidsScored(col("embedding"), cents, 4).as("flat"),
        VectorFunctions.twoLevelNearestCentroidsScored(
          col("embedding"), coarse, groups, wprobe = 4, k = 4).as("tree"))
      .selectExpr("flat = tree AS same")
      .as[Boolean].collect()
    assert(both.forall(identity), "tree(wprobe=ntop) diverged from flat probe")
  }

  test("ivfTopKTwoLevel: full-width tree equals ivfTopK; narrow tree keeps recall") {
    val emb = graft.ops.Tables.table(spark, sf, "embeddings")
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val flat = Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", 5, nlist = 16, nprobe = 4, portableSeeds = true)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val full = Similarity.ivfTopKTwoLevel(emb, "vec_id", "embedding",
        queries, "qid", "qvec", 5, nlist = 16, ntop = 4, wprobe = 4,
        nprobe = 4, portableSeeds = true)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(full.toSeq == flat.toSeq,
      "wprobe = ntop must reproduce the one-level IVF row-for-row")
    // the narrow tree is the production shape — recall floor vs exact
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val narrow = Similarity.ivfTopKTwoLevel(emb, "vec_id", "embedding",
        queries, "qid", "qvec", 5, nlist = 16, ntop = 4, wprobe = 2,
        nprobe = 4, portableSeeds = true)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & narrow).size.toDouble / exact.size
    assert(recall >= 0.4, s"two-level recall collapsed: $recall")
    // the probe adds no exchange to either side: the only exchanges in
    // the plan are the candidate join's and the final top-k's
    val plan = Similarity.ivfTopKTwoLevel(emb, "vec_id", "embedding",
        queries, "qid", "qvec", 5, nlist = 16, ntop = 4, wprobe = 2,
        nprobe = 4, portableSeeds = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"query side must broadcast, not shuffle:\n$plan")
  }

  test("kmeans-trained ivf centroids differ from seeds and keep recall") {
    val emb = graft.ops.Tables.table(spark, sf, "embeddings")
    val seeds = Similarity.seedCentroids(emb, "vec_id", "embedding", 8).toMap
    val trained = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nlist = 8, iterations = 2).toMap
    assert(trained.keySet == seeds.keySet, "training must keep cell identities")
    assert(trained.exists { case (k, v) => !java.util.Arrays.equals(v, seeds(k)) },
      "two Lloyd iterations must move at least one centroid")
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, "qid", "qvec", 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", queries, "qid", "qvec", 5,
        nlist = 8, nprobe = 4, trainIterations = 2)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"trained-IVF recall collapsed: $recall")
  }

  test("per-row minhash signature is bit-identical to the explode+aggregate form") {
    val docs = graft.ops.Tables.table(spark, sf, "documents").limit(50)
      .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
    val perRow = Dedup.minhashSignatures(docs, "doc_id", col("sh"), 64)
      .as[(Long, Seq[Long])].collect().toMap
    val viaAgg = docs
      .select(col("doc_id"), explode(col("sh")).as("__s"))
      .select(col("doc_id"),
        pmod(xxhash64(col("__s")), lit(graft.functions.MinHashSig.MersennePrime)).as("__h"))
      .groupBy("doc_id")
      .agg(graft.functions.MinHashSig.sig(col("__h"), 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(perRow == viaAgg, "signature formulations diverged")
  }

  test("char-gram minhash off the text is bit-identical to the gram-array form") {
    val docs = graft.ops.Tables.table(spark, sf, "documents").limit(50)
    val direct = docs.select(col("doc_id"),
        graft.functions.MinHashSig.sigCharsRow(col("text"), 5, 48).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaArray = docs.select(col("doc_id"),
        graft.functions.MinHashSig.sigRow(TextOps.charShingles(col("text"), 5), 48).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(direct == viaArray, "char-gram signature formulations diverged")
  }

  test("per-row simhash is bit-identical to the explode+aggregate form") {
    val docs = graft.ops.Tables.table(spark, sf, "documents").limit(50)
    val perRow = Dedup.simhashes(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val viaAgg = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("__t"))
      .select(col("doc_id"), xxhash64(col("__t")).as("__h"))
      .groupBy("doc_id")
      .agg(graft.functions.SimHashAgg.sim(col("__h")).as("sim"))
      .as[(Long, Long)].collect().toMap
    assert(perRow == viaAgg, "simhash formulations diverged")
  }

  test("z-order key interleaves bits and zorderBy yields disjoint file ranges") {
    // reference interleave computed independently
    def zRef(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val pts = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val df = pts.toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        graft.ops.Layout.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == zRef(x, y), s"z($x,$y)") }
    // range-partitioned by z: per-partition z ranges must not overlap
    val parts = graft.ops.Layout.zorderBy(df, col("x"), col("y"), numPartitions = 4)
      .withColumn("z", graft.ops.Layout.zValue(col("x"), col("y")))
      .withColumn("p", org.apache.spark.sql.functions.spark_partition_id())
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._2)
    parts.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping z ranges across files: $parts")
      case _ => ()
    }
  }

  test("corpusDiff classifies added/removed/changed and hides the unchanged mass") {
    val old0 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val new0 = Seq((2L, "b"), (3L, "CHANGED"), (4L, "now text"), (5L, "new"))
      .toDF("id", "text")
    val out = graft.ops.Dedup.corpusDiff(old0, new0, "id", "text")
      .as[(Long, String)].collect().toMap
    // 1 removed, 2 unchanged (absent), 3 changed, 4 null→text = changed
    // (presence tracked separately from the digest's nullness), 5 added
    assert(out == Map(1L -> "removed", 3L -> "changed",
      4L -> "changed", 5L -> "added"))
  }

  test("compactTo sizes output files to the data, losslessly, both shuffle modes") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val sliver = s"$base/sliver"
    val df = spark.range(0, 20000)
      .select(col("id"), concat(lit("x" * 200), col("id").cast("string")).as("pad"))
    df.repartition(48).write.mode("overwrite").parquet(sliver)
    val nIn = new java.io.File(sliver).listFiles()
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(nIn == 48)
    // tiny target → several files; count follows ceil(bytes/target)
    val fs = new org.apache.hadoop.fs.Path(sliver)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(sliver)).getLength
    val target = bytes / 4
    val n1 = graft.ops.Layout.compactTo(spark, sliver, s"$base/c1", target)
    assert(n1 == math.ceil(bytes.toDouble / target).toInt, s"got $n1 files")
    assert(n1 < nIn)
    val back1 = spark.read.parquet(s"$base/c1")
    assert(back1.exceptAll(df).isEmpty && df.exceptAll(back1).isEmpty)
    // shuffle=false (coalesce) also compacts and stays lossless
    val n2 = graft.ops.Layout.compactTo(spark, sliver, s"$base/c2",
      bytes * 2, shuffle = false)
    assert(n2 == 1)
    val back2 = spark.read.parquet(s"$base/c2")
    assert(back2.exceptAll(df).isEmpty && df.exceptAll(back2).isEmpty)
    // in-place compaction is refused
    intercept[IllegalArgumentException] {
      graft.ops.Layout.compactTo(spark, sliver, sliver, target)
    }
  }

  test("writeWithBloom: footer carries bloom filters on the asked columns only") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    val df = spark.range(0, 5000)
      .select(col("id"), (col("id") * 7 % 1000).as("k"))
    graft.ops.Layout.writeWithBloom(df, dir, Seq("k"), expectedNdv = 1000)
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns.asScala
      val kCol = cols.find(_.getPath.toDotString == "k").get
      val idCol = cols.find(_.getPath.toDotString == "id").get
      assert(kCol.getBloomFilterOffset >= 0, "k must carry a bloom filter")
      assert(idCol.getBloomFilterOffset < 0, "id must not carry one")
      val bloom = reader.readBloomFilter(kCol)
      assert(bloom != null)
      // the filter actually works at the parquet level (engine-agnostic):
      // every present key hits, an absent key misses (no false negative
      // is possible; a false positive for ONE probe at ndv=1000 is
      // astronomically unlikely at the default 1% fpp)
      def mightContain(v: Long): Boolean = bloom.findHash(bloom.hash(v))
      assert((0 until 1000).forall(c => mightContain(c.toLong)),
        "present keys must hit the bloom filter")
      assert(!mightContain(123456789L), "an absent key should miss")
    } finally reader.close()
    // correctness never depends on the filter: present and absent keys
    val back = spark.read.parquet(dir)
    assert(back.where(col("k") === 3).count() ==
      df.where(col("k") === 3).count())
    assert(back.where(col("k") === 123456).count() == 0)
  }

  test("Profile.summary: counts, nulls, distinct, modal value with tie-break") {
    val df = Seq(
      (1L, Some("a"), 10),
      (2L, Some("a"), 10),
      (3L, Some("b"), 20),
      (4L, Some("b"), 20),
      (5L, None, 30)
    ).toDF("id", "s", "n")
    val out = graft.ops.Profile.summaryOf(df, "s", "n")
      .as[(String, Long, Long, Long, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    // s: 5 rows, 1 null, 2 distinct, tie a/b at 2 → lexicographically smaller 'a'
    assert(out("s") == (("s", 5L, 1L, 2L, "a", 2L)))
    // n: stringified ints; tie 10/20 at 2 → "10"
    assert(out("n") == (("n", 5L, 0L, 3L, "10", 2L)))
    // melt stays row-local: the only exchange is the (col, value) groupBy
    val exchanges = graft.ops.Profile.summaryOf(df, "s", "n")
      .queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
    assert(exchanges.size <= 2, s"melt must not add exchanges: ${exchanges.size}")
  }

  test("Profile.exactQuantilesBy: hand-computed CDF picks, edges, guards") {
    // group g: values 1,2,3,4,5,5,5,5,5,10 (n=10)
    // cdf: 1→1, 2→2, 3→3, 4→4, 5→9, 10→10
    val g = Seq(1, 2, 3, 4, 5, 5, 5, 5, 5, 10).map(("g", _))
    // group h: single value (every percent hits it)
    val h = Seq(("h", 7))
    val df = (g ++ h).toDF("grp", "v")
    val out = graft.ops.Profile
      .exactQuantilesBy(df, "grp", "v", Seq(1, 10, 40, 50, 90, 99, 100))
      .as[(String, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // rank = ceil(10*p/100): p1→1(v=1), p10→1(v=1), p40→4(v=4),
    // p50→5(v=5), p90→9(v=5), p99→10(v=10), p100→10(v=10)
    assert(out(("g", 1)) == 1L && out(("g", 10)) == 1L)
    assert(out(("g", 40)) == 4L)
    assert(out(("g", 50)) == 5L && out(("g", 90)) == 5L)
    assert(out(("g", 99)) == 10L && out(("g", 100)) == 10L)
    assert(Seq(1, 10, 40, 50, 90, 99, 100).forall(p => out(("h", p)) == 7L))
    // nulls are excluded from ranks, not counted
    val withNull = (g.map { case (k, v) => (k, Some(v): Option[Int]) } ++
      Seq(("g", None: Option[Int]))).toDF("grp", "v")
    val n = graft.ops.Profile
      .exactQuantilesBy(withNull, "grp", "v", Seq(100))
      .as[(String, Int, Long, Long)].head()
    assert(n._3 == 10L && n._4 == 10L)
    // guards: non-integral value column, out-of-range/duplicate percents
    val dbl = Seq(("g", 1.5)).toDF("grp", "v")
    intercept[IllegalArgumentException] {
      graft.ops.Profile.exactQuantilesBy(dbl, "grp", "v", Seq(50)) }
    intercept[IllegalArgumentException] {
      graft.ops.Profile.exactQuantilesBy(df, "grp", "v", Seq(0)) }
    intercept[IllegalArgumentException] {
      graft.ops.Profile.exactQuantilesBy(df, "grp", "v", Seq(50, 50)) }
    // no single-partition exchange: every Exchange is keyed, none is
    // SinglePartition (the global-sort anti-pattern this op exists
    // to avoid)
    val plan = graft.ops.Profile
      .exactQuantilesBy(df, "grp", "v", Seq(50, 90))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in quantile plan:\n$plan")
  }

  test("TimeSeries.gapFillLocf: gaps emitted, locf carries, step guard") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 1L, 5L),   // bucket 1: 2 events, 15
      ("a", 2L, 7L),                   // bucket 2: 1 event, 7
      ("a", 5L, 1L),                   // buckets 3,4 are gaps
      ("b", 9L, 4L)                    // single-bucket key: no gaps
    ).toDF("k", "b", "v")
    val out = graft.ops.TimeSeries
      .gapFillLocf(df, "k", col("b"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getBoolean(4), r.getLong(5)))).toMap
    assert(out(("a", 1L)) == ((2L, Some(15L), false, 15L)))
    assert(out(("a", 2L)) == ((1L, Some(7L), false, 7L)))
    assert(out(("a", 3L)) == ((0L, None, true, 7L)))  // gap: locf from b2
    assert(out(("a", 4L)) == ((0L, None, true, 7L)))
    assert(out(("a", 5L)) == ((1L, Some(1L), false, 1L)))
    assert(out(("b", 9L)) == ((1L, Some(4L), false, 4L)))
    assert(out.size == 6) // dense grid: 5 buckets for a, 1 for b
    intercept[IllegalArgumentException] {
      graft.ops.TimeSeries.gapFillLocf(df, "k", col("b"), col("v"), step = 0)
    }
    // step > 1: buckets fold into floor-aligned cells, so an off-grid
    // observation (bucket 5 at step 2 → cell 4) is aggregated, never
    // silently dropped by a grid that advances by step
    val out2 = graft.ops.TimeSeries
      .gapFillLocf(df.where(col("k") === "a"), "k", col("b"), col("v"),
        step = 2)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getBoolean(4), r.getLong(5)))).toMap
    // cells: 0 (bucket 1: 2 ev, 15), 2 (bucket 2: 1 ev, 7), 4 (bucket 5)
    assert(out2(0L) == ((2L, false, 15L)))
    assert(out2(2L) == ((1L, false, 7L)))
    assert(out2(4L) == ((1L, false, 1L)))
    assert(out2.size == 3) // every event accounted for, no gap cells
    assert(out2.values.map(_._1).sum == 4L,
      "step > 1 must fold off-grid observations, not drop them")
  }

  test("grouped top-ngram fraction equals the per-row HOF formulation") {
    val docs = graft.ops.Tables.table(spark, sf, "documents").limit(50)
    val viaHof = docs.select(col("doc_id"),
        TextOps.topNgramFraction(col("text"), 2).as("f"))
      .as[(Long, Double)].collect().toMap
    val grouped = TextOps.topNgramFractions(docs, "doc_id", "text", 2)
      .as[(Long, Double)].collect().toMap
    for ((id, f) <- grouped) assert(f == viaHof(id), s"doc $id: $f vs ${viaHof(id)}")
    // HOF emits 0.0 for gram-less docs; grouped omits them
    assert(viaHof.keySet.diff(grouped.keySet).forall(id => viaHof(id) == 0.0))
  }

  test("hll sketch merge: unioned partial sketches equal the whole-set sketch") {
    val ev = graft.ops.Tables.table(spark, sf, "events")
    val whole = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head.getLong(0)
    val merged = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head.getLong(0)
    assert(merged == whole, s"merge-of-partials must equal whole-set sketch: $merged vs $whole")
    val exact = ev.select(countDistinct(col("user_id"))).head.getLong(0)
    val err = math.abs(merged - exact).toDouble / exact
    assert(err < 0.05, s"HLL estimate off by ${err * 100}%: $merged vs exact $exact")
  }

  test("connected components labels every node with its component's min id") {
    // component {1,2,3} (triangle-free chain), singleton pair {10,11},
    // and a diameter-3 chain {20,21,22,23} to force multiple rounds
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L),
        (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("connected components of an empty pair set is empty") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(pairs).count() == 0)
  }

  test("binned range join matches the naive theta join and stays an equi-join") {
    val points = (0 until 200).map(i => (i.toLong, i * 1.5)).toDF("pid", "v")
    val iv = Seq((1L, 10.0, 25.0), (2L, 24.0, 24.0), (3L, 290.0, 310.0),
      (4L, -5.0, 3.0)).toDF("iid", "lo", "hi")
    val joined = RangeJoin.binnedPointInterval(points, "v", iv, "lo", "hi", 7.0)
    val got = joined.select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = points.crossJoin(iv).where(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty, s"binned=$got naive=$want")
    // the point of the binning: a partitionable equi-join, never a
    // nested-loop/cartesian shape
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a non-equi physical shape:\n$plan")
  }

  test("scrubPii replaces urls, emails and long digit runs but not short numbers") {
    val df = Seq(
      (1L, "see https://ex.com/a?id=1234567 or mail bob.smith+x@ex-mail.co, call 5551234567, room 42"),
      (2L, "no pii here, just 12345 and v2.0"))
      .toDF("id", "text")
      .select(col("id"), TextOps.scrubPii(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(df(1L) == "see [URL] or mail [EMAIL], call [NUM], room 42")
    assert(df(2L) == "no pii here, just 12345 and v2.0")
  }

  test("sequence packing shards deterministically and chunks by cumulative tokens") {
    val docs = Seq((0L, 300), (2L, 300), (4L, 300), (6L, 100), // shard 0
        (1L, 600), (3L, 10))                                   // shard 1
      .toDF("doc_id", "toks")
    val packed = graft.ops.Packing.packSequences(docs, "doc_id", "toks",
        ctxLen = 512, numShards = 2)
      .select("doc_id", "shard", "start_offset", "pack")
      .as[(Long, Long, Long, Long)].collect().toSet
    // shard 0 offsets: 0, 300, 600, 900 → packs 0, 0, 1, 1
    // shard 1 offsets: 0, 600 → packs 0, 1
    assert(packed == Set(
      (0L, 0L, 0L, 0L), (2L, 0L, 300L, 0L), (4L, 0L, 600L, 1L), (6L, 0L, 900L, 1L),
      (1L, 1L, 0L, 0L), (3L, 1L, 600L, 1L)))
  }

  test("ffdPack: hand-computed greedy, capacity invariant, beats naive fill on the fixture") {
    // one shard; decreasing order: 9,7,6,5,3,2 with C=10 →
    // 9 -> b1; 7 -> b2; 6 -> b3; 5 -> b3(6+5>10? 11>10 no) -> scan: b1 9+5>10,
    // b2 7+5>10, b3 6+5>10 -> b4; 3 -> b2(7+3=10); 2 -> b3(6+2=8... b1 9+2>10 first)
    val docs = Seq((8L, 9L), (16L, 7L), (24L, 6L), (32L, 5L), (40L, 3L), (48L, 2L))
      .toDF("doc_id", "len")
    val out = graft.ops.Packing.ffdPack(docs, "doc_id", "len",
        capacity = 10L, numShards = 8)
      .select("doc_id", "bin", "oversize").as[(Long, Int, Boolean)]
      .collect().map { case (id, b, _) => id -> b }.toMap
    assert(out == Map(8L -> 1, 16L -> 2, 24L -> 3, 32L -> 4, 40L -> 2, 48L -> 3),
      s"got $out")

    // invariants on the fixture: no non-oversize bin exceeds capacity;
    // every doc appears exactly once; result is input-order independent
    val fixture = graft.ops.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars").cast("long").as("len"))
    val packed = graft.ops.Packing.ffdPack(fixture, "doc_id", "len", 1200L, 8)
    val fills = packed.groupBy("shard", "bin")
      .agg(sum("len").as("fill"), max(col("oversize").cast("int")).as("ov"))
    assert(fills.where(col("fill") > 1200 && col("ov") === 0).count() == 0)
    assert(packed.count() == fixture.count())
    assert(packed.select("doc_id").distinct().count() == fixture.count())
    val shuffled = graft.ops.Packing.ffdPack(
      fixture.orderBy(md5(col("doc_id").cast("string"))), "doc_id", "len", 1200L, 8)
    assert(shuffled.orderBy("shard", "bin", "doc_id").collect().toSeq ==
      packed.orderBy("shard", "bin", "doc_id").collect().toSeq,
      "packing must be a pure function of the item set")

    // efficiency vs the naive arrival-order packer (q74's no-sort
    // analogue for whole docs): FFD must use no more bins, and its
    // fill must be near the ceil(total/C) ideal
    val bins = packed.select("shard", "bin").distinct().count()
    val totalLen = fixture.agg(sum("len")).as[Long].collect()(0)
    val ideal = math.ceil(totalLen.toDouble / 1200.0).toLong
    info(s"FFD bins=$bins ideal(no shard/no split)=$ideal fill=${
      totalLen.toDouble / (bins * 1200.0)}")
    assert(bins <= (ideal * 1.25 + 8).toLong,
      s"FFD used $bins bins vs ideal $ideal — fragmentation too high")
  }

  test("sign-LSH pair mining: vectors never ride the pair distinct") {
    val base = Array.tabulate(64)(i => math.sin(i).toFloat)
    val nearDup = base.clone(); nearDup(0) = base(0) + 0.001f
    val far = Array.tabulate(64)(i => math.cos(i * 3).toFloat)
    val df = Seq((0L, base), (1L, nearDup), (2L, far)).toDF("id", "vec")
    // exchanges are inserted by EnsureRequirements (a preparation rule)
    // and AQE wraps the prepared plan in a leaf node — keep AQE off
    // while executedPlan materializes so the concrete
    // ShuffleExchangeExec nodes are visible to collect;
    // materialize=false keeps the full lazy plan inspectable (the
    // materialized path returns a checkpoint scan with no exchanges)
    val pairs = Similarity.lshCosinePairs(df, "id", "vec", threshold = 0.99,
      dim = 64, materialize = false)
    // the verified-pair distinct shuffles on (id_a, id_b); those
    // exchanges must carry the ids plus the scalar cosine and nothing
    // else — the r3 plan dragged both full float vectors through here,
    // and in the r5 payload-carrying formulation the vector rides ONLY
    // the pre-enumeration bucket exchange (once per table), never the
    // pair stream. Auto-broadcast is disabled too:
    // on a 3-row fixture every join (and with it the distinct's
    // exchange) would otherwise collapse to broadcast and there would
    // be no pair shuffle to inspect — at corpus scale the shuffle path
    // is the one that runs.
    val exchanges =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        pairs.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    val pairShuffles = exchanges.filter { e =>
      e.outputPartitioning match {
        case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          val names = h.expressions.flatMap(_.references.map(_.name)).toSet
          names.contains("id_a") && names.contains("id_b")
        case _ => false
      }
    }
    assert(pairShuffles.nonEmpty, "expected a candidate-pair distinct exchange")
    pairShuffles.foreach { e =>
      assert(!e.output.exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]),
        s"pair shuffle carries an array payload: ${e.output.mkString(", ")}")
      assert(e.output.size <= 3,
        s"pair shuffle should carry ids + scalar score only: ${e.output.mkString(", ")}")
    }
    // and the result is still right
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L)))
  }

  test("ivf topK plan has no single-partition exchange (centroid pick scales)") {
    val emb = graft.ops.Tables.table(spark, sf, "embeddings")
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", queries, "qid", "qvec", 5,
      nlist = 8, nprobe = 4)
    val plan = ivf.queryExecution.executedPlan.toString
    // the round-1 centroid pick funneled the corpus through one task
    // (global Window.orderBy => Exchange SinglePartition); assignment is
    // now an inlined argmax, so the main plan must have no
    // single-partition exchange and no nested-loop/cartesian join either
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange in IVF plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"corpus-side non-equi join in IVF plan:\n$plan")
    // the seed pick itself compiles to a per-partition partial top-nlist
    val seedPlan = Similarity.seedCentroidsPlan(emb, "vec_id", "embedding", 8)
      .queryExecution.executedPlan.toString
    assert(seedPlan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject centroid pick:\n$seedPlan")
  }

  test("minHashFingerprint equals the min over exploded k-gram hashes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "short")).toDF("id", "text") // shorter than k → one truncated gram
    val viaExpr = docs
      .select(col("id"), graft.ops.TextOps.minHashFingerprint(col("text"), 8).as("fp"))
      .as[(Long, Long)].collect().toMap
    // independent formulation of the same window: explode each 8-char
    // start offset, hash the substring, take the min per doc
    val viaExplode = docs
      .select(col("id"), col("text"),
        explode(sequence(lit(1), greatest(length(col("text")) - 7, lit(1)))).as("i"))
      .select(col("id"), xxhash64(col("text").substr(col("i"), lit(8))).as("h"))
      .groupBy("id").agg(min("h").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(viaExpr == viaExplode, "windowed expression must equal the exploded min")
    // gram-superset invariant: concatenation only ADDS grams, so its
    // min-hash can only be <= the min of either part's fingerprint
    val cat = Seq((9L,
      "the quick brown fox jumps over the lazy dog pack my box with five dozen liquor jugs"))
      .toDF("id", "text")
    val fpCat = cat.select(graft.ops.TextOps.minHashFingerprint(col("text"), 8))
      .as[Long].head()
    assert(fpCat <= math.min(viaExpr(1L), viaExpr(2L)))
  }

  test("dsirWeights matches the smoothed hashed-LM formula and ranks target-like docs first") {
    import graft.ops.Relevance
    val B = 64
    val target = Seq((100L, "alpha beta alpha"), (101L, "alpha gamma")).toDF("id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha beta"), // target-like
      (2L, "delta epsilon zeta eta"), // out-of-domain
      (3L, "alpha delta")).toDF("id", "text")
    val got = Relevance.dsirWeights(raw, target, "id", "text", buckets = B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // independent reimplementation with libm log (lnOfInt tracks ln to
    // well under 1e-12 on these magnitudes)
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % B
    }
    def toks(s: String): Seq[String] = s.trim.split("\\s+").toSeq.map(_.toLowerCase)
    val tCnt = Seq("alpha beta alpha", "alpha gamma").flatMap(toks)
      .groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val rawDocs = Map(1L -> "alpha beta alpha beta",
      2L -> "delta epsilon zeta eta", 3L -> "alpha delta")
    val rCnt = rawDocs.values.flatMap(toks)
      .groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val (tt, rt) = (tCnt.values.sum, rCnt.values.sum)
    def logratio(b: Long): Double =
      math.log(tCnt.getOrElse(b, 0L) + 1.0) - math.log((tt + B).toDouble) -
        math.log(rCnt.getOrElse(b, 0L) + 1.0) + math.log((rt + B).toDouble)
    for ((id, text) <- rawDocs) {
      val ts = toks(text)
      val expected = ts.map(t => logratio(bucket(t))).sum
      val (n, logw) = got(id)
      assert(n == ts.size)
      assert(math.abs(logw - expected) < 1e-9,
        s"doc $id: logw $logw vs expected $expected")
    }
    // the target-like doc wins the selection; the disjoint one is last
    val ranked = Relevance.dsirTopK(
      Relevance.dsirWeights(raw, target, "id", "text", buckets = B), "id", 3)
      .select("id").as[Long].collect().toSeq
    assert(ranked.head == 1L && ranked.last == 2L, s"ranking off: $ranked")
  }

  test("dsirGumbelTopK: portable seeded Gumbel keys match a libm reference; seed re-deals") {
    import graft.ops.Relevance
    val w = Seq((1L, 5L, 0.5), (2L, 5L, 0.4), (3L, 5L, -1.0), (4L, 5L, 0.45))
      .toDF("id", "n_tokens", "logw")
    val logwOf = Map(1L -> 0.5, 2L -> 0.4, 3L -> -1.0, 4L -> 0.45)
    // independent reimplementation with libm log (the series-ln and the
    // 2^-40 quantization track it far below this tolerance)
    def gumbel(seed: Long, id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 6), 16)
      val t = math.log((1L << 24) + 1L) - math.log(h + 1.0)
      val m = math.floor(t * 1.099511627776e12)
      -(math.log(m) - 40.0 * 0.6931471805599453)
    }
    val sel = Relevance.dsirGumbelTopK(w, "id", 4, seed = 7L)
      .select("id", "gkey").as[(Long, Double)].collect().toMap
    assert(sel.size == 4)
    for ((id, gkey) <- sel) {
      val expected = logwOf(id) + gumbel(7L, id)
      assert(math.abs(gkey - expected) < 1e-6,
        s"id $id: gkey $gkey vs libm reference $expected")
    }
    // partitioning independence
    val again = Relevance.dsirGumbelTopK(w.repartition(5), "id", 4, seed = 7L)
      .select("id", "gkey").as[(Long, Double)].collect().toMap
    assert(again == sel)
    // the policy SAMPLES ∝ exp(logw): over many seeds (validated-identical
    // scala reference, zero Spark cost) the heavy doc wins far more often
    // than the light one, and some seed departs from the plain-top-k order
    val wins = (1 to 500).map { s =>
      logwOf.keys.maxBy(id => logwOf(id) + gumbel(s.toLong, id))
    }.groupBy(identity).view.mapValues(_.size).toMap
    assert(wins.getOrElse(1L, 0) > wins.getOrElse(3L, 0),
      s"heavy doc should win more draws: $wins")
    assert(wins.size > 1, "Gumbel never re-dealt the winner across 500 seeds")
  }

  test("canonicalUrl: host case, ports, tracking params, fragments, slash noise") {
    val cases = Seq(
      // host/scheme lowercased, path case preserved
      "HTTPS://WWW.Ex.COM/Path/File" -> "https://www.ex.com/Path/File",
      // default ports stripped, bare host and with path
      "http://ex.com:80" -> "http://ex.com",
      "https://ex.com:443/x" -> "https://ex.com/x",
      // non-default port kept
      "https://ex.com:8443/x" -> "https://ex.com:8443/x",
      // fragment stripped
      "https://ex.com/x#section-2" -> "https://ex.com/x",
      // tracking params dropped wherever they sit; real params survive in order
      "https://ex.com/x?utm_source=a&id=1&utm_medium=b&q=2" -> "https://ex.com/x?id=1&q=2",
      "https://ex.com/x?fbclid=abc" -> "https://ex.com/x",
      "https://ex.com/x?id=1&gclid=zzz" -> "https://ex.com/x?id=1",
      // duplicate path slashes collapse; scheme's // survives
      "https://ex.com//a///b" -> "https://ex.com/a/b",
      // trailing slash and slash-before-query normalize
      "https://ex.com/a/" -> "https://ex.com/a",
      "https://ex.com/a/?id=1" -> "https://ex.com/a?id=1",
      // everything at once
      "HTTPS://EX.com:443//a//b/?utm_campaign=x&id=9#f" -> "https://ex.com/a/b?id=9",
      // ":443/" in a PATH segment is not a port — must survive untouched
      "https://h.com/a:443/b" -> "https://h.com/a:443/b",
      // ":80/" and "//" inside a query VALUE (embedded redirect url) are
      // data, not structure — global port-strip/slash-collapse would merge
      // this with its ':80'-less / single-slash siblings
      "https://ex.com/r?next=http://x.com:80/y" -> "https://ex.com/r?next=http://x.com:80/y",
      "https://ex.com/r?next=https://x.com//y" -> "https://ex.com/r?next=https://x.com//y",
      // trailing slash inside a query value preserved; path one stripped
      "https://ex.com/a/?p=/home/" -> "https://ex.com/a?p=/home/",
      // scheme-relative url still gets its default port stripped
      "//ex.com:443/x" -> "//ex.com/x")
    val got = cases.map(_._1).toDF("url")
      .select(graft.ops.TextOps.canonicalUrl(col("url")))
      .as[String].collect().toSeq
    cases.map(_._2).zip(got).foreach { case (want, g) =>
      assert(g == want, s"expected $want got $g")
    }
  }

  test("robustOutliersBy: known medians, zero-MAD degeneracy, inlier group") {
    import spark.implicits._
    // g1: values 1..9 plus a 100 spike -> med 5.00, MAD ~2.00 in cents
    // g2: constant 7 except one 9       -> MAD 0, every other value fenced
    // g3: tight cluster, no outliers    -> NULL extremes
    val rows =
      ((1 to 9).map(v => ("g1", v.toDouble)) :+ ("g1", 100.0)) ++
      (Seq.fill(9)(("g2", 7.0)) :+ ("g2", 9.0)) ++
      Seq(("g3", 1.0), ("g3", 1.01), ("g3", 1.02))
    val got = graft.ops.Profile
      .robustOutliersBy(rows.toDF("g", "v"), "g", "v", k = 3)
      .orderBy("g")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    // g1: cents 100..900,10000; n=10 -> median rank ceil(5)=5 -> 500;
    //     devs 0,100..400,9500 -> MAD 200; fence 600 -> only 10000 out
    assert(got(0) == ("g1", 10L, 500L, 200L, 1L, Some(10000L), Some(10000L)))
    // g2: med 700, MAD 0, fence 0 -> the single 900 is out
    assert(got(1) == ("g2", 10L, 700L, 0L, 1L, Some(900L), Some(900L)))
    // g3: cents 100,101,102 -> med 101, MAD 1, fence 3 -> none out
    assert(got(2) == ("g3", 3L, 101L, 1L, 0L, None, None))
  }

  test("keyDistribution: hand-computed entropy/gini, uniform edge") {
    import spark.implicits._
    // k: counts a:4, b:2, c:1, d:1 (n=8, D=4)
    // u: perfectly uniform 2,2,2,2
    val rows = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .zipWithIndex.map { case (k, i) => (k, Seq("w","x","y","z")(i % 4)) }
    val got = graft.ops.Profile
      .keyDistribution(rows.toDF("k", "u"), Seq("k", "u"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    val (kRow, uRow) = (got(0), got(1))
    assert(kRow._1 == "k" && kRow._2 == 8L && kRow._3 == 4L && kRow._4 == 4L)
    assert(math.abs(kRow._5 - 0.5) < 1e-15)                       // top share
    val entK = math.log(8) - (2 * math.log(2) + 4 * math.log(4)) / 8
    // DECIMAL(18,6) rounds each c*ln(c) term to 1e-6 (portability by
    // construction beats the last digits): tolerance is term-count-scaled
    assert(math.abs(kRow._6 - entK) < 1e-5, s"entropy ${kRow._6} vs $entK")
    // sorted c = 1,1,2,4 -> sum i*c = 25 -> G = 50/32 - 5/4 = 0.3125
    assert(math.abs(kRow._7 - 0.3125) < 1e-15, s"gini ${kRow._7}")
    assert(uRow._1 == "u" && uRow._3 == 4L && math.abs(uRow._7) < 1e-15)
    val entU = math.log(8) - (8 * math.log(2)) / 8
    assert(math.abs(uRow._6 - entU) < 1e-5)
  }

  test("winsorizeBy: hand-computed fences, clip counts, means") {
    import spark.implicits._
    val rows = (1 to 10).map(v => ("g", v.toDouble)) // cents 100..1000
    val got = graft.ops.Profile
      .winsorizeBy(rows.toDF("g", "v"), "g", "v", pLow = 10, pHigh = 90)
      .as[(String, Long, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    // ranks: lo = ceil(10*10/100) = 1 -> 100; hi = ceil(9) = 9 -> 900
    // clipped: none below 100, only 1000 above 900
    // means: raw 550; winsorized (5500 - 1000 + 900)/10 = 540
    assert(got == Seq(("g", 10L, 100L, 900L, 0L, 1L, 550.0, 540.0)), got)
  }
}
