package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{Decontamination, Dedup, Quantize, Relevance}

/** Round-3 pipeline ops: BM25 relevance, int8 quantization, benchmark
  * decontamination, keep-one-representative dedup. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 log-idf matches a hand-computed score on a tiny corpus") {
    // corpus: 3 docs; query = ["cat"]; df(cat) = 2, N = 3
    val docs = Seq(
      (1L, "cat sat on the mat"),     // dl=5, tf=1
      (2L, "cat cat dog"),            // dl=3, tf=2
      (3L, "dog dog dog dog")         // dl=4, tf=0
    ).toDF("id", "text")
    val out = Relevance.bm25(docs, "id", "text", Seq("cat"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L), "only matching docs emitted")
    val k1 = 1.2; val b = 0.75
    val avgdl = (5 + 3 + 4) / 3.0
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def sat(tf: Double, dl: Double) =
      tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
    assert(math.abs(out(0).getDouble(2) - idf * sat(1, 5)) < 1e-12)
    assert(math.abs(out(1).getDouble(2) - idf * sat(2, 3)) < 1e-12)
    // more occurrences in a shorter doc must score higher
    assert(out(1).getDouble(2) > out(0).getDouble(2))
  }

  test("bm25 batch search ranks agree with the single-query scorer") {
    val docs = Seq(
      (1L, "cat sat on the mat"),
      (2L, "cat cat dog"),
      (3L, "dog dog dog dog"),
      (4L, "fish cat fish")
    ).toDF("id", "text")
    val queries = Seq((10, Seq("cat")), (20, Seq("dog", "fish"))).toDF("qid", "terms")
    val ranked = Relevance.bm25SearchTopK(docs, "id", "text", queries, "qid", "terms", k = 2)
      .select("qid", "rank", "id").as[(Int, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val single = Relevance.bm25(docs, "id", "text", Seq("cat"))
      .orderBy(col("score").desc, col("id").asc)
      .select("id").as[Long].collect().take(2).toSeq
    assert(ranked(10) == single,
      s"batch search must agree with single-query bm25: ${ranked(10)} vs $single")
    assert(ranked(20).size == 2 && ranked(20).toSet.subsetOf(Set(2L, 3L, 4L)),
      s"dog/fish query must rank dog/fish docs: ${ranked(20)}")
  }

  test("bm25 scales without exploding tokens: no per-token shuffle in the plan") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("id", "text")
    val plan = Relevance.bm25(docs, "id", "text", Seq("b"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("generate"),
      s"bm25 must not explode the token arrays:\n$plan")
  }

  test("int8 quantization: codes bounded, roundtrip error within scale/2") {
    val emb = graft.ops.Tables.table(spark, sf, "embeddings").limit(200)
    val q = Quantize.int8(emb, "vec_id", "embedding")
      .join(emb, "vec_id")
      .select(col("vec_id"), col("scale"),
        array_max(transform(col("q"), x => abs(x))).as("maxcode"),
        Quantize.maxError(col("embedding"), col("q"), col("scale")).as("err"))
      .collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      assert(r.getLong(2) <= 127L, s"code out of range: $r")
      // half-up rounding error is at most scale/2 (+ ulps)
      assert(r.getDouble(3) <= r.getDouble(1) / 2 + 1e-9, s"roundtrip error too large: $r")
    }
  }

  test("quantized cosine approximates float cosine") {
    val emb = graft.ops.Tables.table(spark, sf, "embeddings").limit(50)
    val q = Quantize.int8(emb, "vec_id", "embedding").join(emb, "vec_id")
      .select(col("vec_id"),
        Quantize.dequantize(col("q"), col("scale")).cast("array<float>").as("deq"),
        col("embedding").as("v"))
    val pairs = q.as("a").crossJoin(q.as("b"))
      .where(col("a.vec_id") < col("b.vec_id")).limit(300)
      .select(
        graft.ops.Similarity.cosine(col("a.v"), col("b.v")).as("cf"),
        graft.ops.Similarity.cosine(col("a.deq"), col("b.deq")).as("cq"))
      .collect()
    pairs.foreach(r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.02,
        s"int8 cosine drifted: $r"))
  }

  test("packInt8 / int8Dot: bytes round-trip the codes, dot matches integer math") {
    val df = Seq((1L, Seq(-127L, 0L, 127L, 5L)), (2L, Seq(1L, 2L, 3L, 4L)))
      .toDF("id", "codes")
      .withColumn("packed", graft.functions.VectorFunctions.packInt8(col("codes")))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getAs[Array[Byte]]("packed").toSeq == Seq[Byte](-127, 0, 127, 5))
    val dot = df.where($"id" === 1).crossJoin(df.where($"id" === 2).select($"packed".as("p2")))
      .select(graft.functions.VectorFunctions.int8Dot($"packed", $"p2").as("d"))
      .head().getLong(0)
    assert(dot == -127 * 1 + 0 * 2 + 127 * 3 + 5 * 4, s"int8 dot wrong: $dot")
  }

  test("quantized two-stage ANN: high recall vs the exact float top-k") {
    val emb = graft.ops.Tables.table(spark, sf, "embeddings")
    val queries = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val k = 5
    def neighborSets(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = neighborSets(
      graft.ops.Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k))
    val quant = neighborSets(
      graft.ops.Similarity.bruteForceTopKQuantized(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k))
    val recall = exact.map { case (q, ns) =>
      (ns intersect quant.getOrElse(q, Set.empty)).size.toDouble / ns.size
    }.sum / exact.size
    assert(recall >= 0.9, s"quantized ANN recall too low: $recall")
  }

  test("PQ encode/ADC: hand-computed codes, tie to the smaller centroid, table lookups") {
    import graft.functions.{PqModel, VectorFunctions => VF}
    // m=2 subspaces of dsub=2, ksub=2 centroids each
    val model = PqModel(2, 2, Array(
      Array(Array(0f, 0f), Array(1f, 1f)),     // subspace 0
      Array(Array(1f, 0f), Array(0f, 1f))))    // subspace 1
    val df = Seq(
      (1L, Array(0.9f, 0.9f, 0.1f, 0.9f)),  // sub0 → c1, sub1 → c1
      (2L, Array(0.5f, 0.5f, 1.0f, 0.0f))   // sub0 EQUIDISTANT → c0 (tie); sub1 → c0
    ).toDF("id", "vec")
    val codes = df.select(col("id"), VF.pqEncode(col("vec"), model).as("c"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(codes(1L).toSeq == Seq[Byte](1, 1))
    assert(codes(2L).toSeq == Seq[Byte](0, 0))
    // ADC table of query q = [1,0, 0,1]: dt = [dot(q0,c) for c] ++ [dot(q1,c) for c]
    //   sub0: dot([1,0],[0,0])=0, dot([1,0],[1,1])=1
    //   sub1: dot([0,1],[1,0])=0, dot([0,1],[0,1])=1
    val q = Seq((9L, Array(1f, 0f, 0f, 1f))).toDF("qid", "qvec")
    val dt = q.select(VF.pqDistTable(col("qvec"), model).as("t"))
      .as[Array[Double]].head().toSeq
    assert(dt == Seq(0.0, 1.0, 0.0, 1.0))
    // ADC score of codes [1,1] against that table = dt[1] + dt[2+1] = 2
    val scored = df.select(col("id"),
        VF.pqAdcScore(VF.pqEncode(col("vec"), model),
          typedLit(dt), model.ksub).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(scored(1L) == 2.0)  // codes (1,1) → 1 + 1
    assert(scored(2L) == 0.0)  // codes (0,0) → 0 + 0
  }

  test("PQ two-stage ANN: recall floor vs the exact float top-k (deterministic)") {
    val emb = graft.ops.Tables.table(spark, sf, "embeddings")
    val queries = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val k = 5
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets(graft.ops.Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", queries, "qid", "qvec", k))
    val pq = sets(graft.ops.Similarity.pqTopK(
      emb, "vec_id", "embedding", queries, "qid", "qvec", k,
      m = 16, ksub = 16, shortlist = 64))
    val recall = exact.map { case (q, ns) =>
      (ns intersect pq.getOrElse(q, Set.empty)).size.toDouble / ns.size
    }.sum / exact.size
    // deterministic pipeline on a fixed fixture: measured 0.85 — the
    // floor is a regression tripwire, not a statistical bound
    assert(recall >= 0.8, s"PQ ANN recall too low: $recall")
  }

  test("PQ trained codebooks improve recall over the seed pick") {
    val emb = graft.ops.Tables.table(spark, sf, "embeddings")
    val queries = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val k = 5
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets(graft.ops.Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", queries, "qid", "qvec", k))
    def recall(trainIters: Int): Double = {
      val pq = sets(graft.ops.Similarity.pqTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k, m = 16, ksub = 16, shortlist = 64,
        trainIterations = trainIters))
      exact.map { case (q, ns) =>
        (ns intersect pq.getOrElse(q, Set.empty)).size.toDouble / ns.size
      }.sum / exact.size
    }
    val seed = recall(0)
    val trained = recall(2)
    assert(trained >= seed,
      s"Lloyd-trained codebooks must not lose recall: seed=$seed trained=$trained")
    // the training must actually move the codebook
    val m0 = graft.ops.Similarity.pqModelPortable(emb, "vec_id", "embedding", 16, 16)
    val m2 = graft.ops.Similarity.pqModelTrained(emb, "vec_id", "embedding", 16, 16, 2)
    assert(m0.m == m2.m && m0.dsub == m2.dsub && m0.ksub == m2.ksub)
    assert(m0.codebook.flatten.flatten.toSeq != m2.codebook.flatten.flatten.toSeq)
  }

  test("signed random projection: hand-computed sums, linearity, no shuffle") {
    import graft.ops.Quantize
    import graft.functions.{VectorFunctions => VF}
    // explicit 2x3 sign matrix — rows are the projection directions
    val signs = Array(Array(1f, -1f, 1f), Array(-1f, 1f, 1f))
    val df = Seq(
      (1L, Array(1f, 2f, 4f)),   // → (1-2+4, -1+2+4) = (3, 5)
      (2L, Array(0.5f, 0f, 0f))  // → (0.5, -0.5)
    ).toDF("id", "vec")
    val out = df.select(col("id"), VF.signedProject(col("vec"), signs).as("p"))
      .as[(Long, Array[Double])].collect().toMap
    assert(out(1L).toSeq == Seq(3.0, 5.0))
    assert(out(2L).toSeq == Seq(0.5, -0.5))
    // linearity: proj(x) + proj(y) == proj(x + y) for exactly-representable inputs
    val sum = df.agg(collect_list(col("vec"))).as[Seq[Seq[Float]]].head()
    val xy = sum.head.zip(sum(1)).map { case (a, b) => a + b }.toArray
    val pxy = Seq((9L, xy)).toDF("id", "vec")
      .select(VF.signedProject(col("vec"), signs)).as[Array[Double]].head()
    assert(pxy.toSeq == out(1L).zip(out(2L)).map { case (a, b) => a + b }.toSeq)
    // srpSigns is ±1-valued and deterministic across calls
    val m1 = Quantize.srpSigns(8, 4, seed = 7L)
    val m2 = Quantize.srpSigns(8, 4, seed = 7L)
    assert(m1.flatten.toSeq == m2.flatten.toSeq)
    assert(m1.flatten.forall(v => v == 1.0f || v == -1.0f))
    assert(Quantize.srpSigns(8, 4, seed = 8L).flatten.toSeq != m1.flatten.toSeq)
    // the projection is a row-local codegen expression — no exchange
    val exchanges = Quantize.srpProject(df, "id", "vec", 4, 3)
      .queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
    assert(exchanges.isEmpty)
  }

  test("hardNegatives excludes same-label rows even when they are the nearest") {
    import graft.ops.Similarity
    // anchor 1 (label A) is nearly identical to 2 (label A) and less
    // similar to 3/4 (label B) — the same-label near-duplicate must
    // NEVER appear among its negatives
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f), "A"),
      (2L, Array(0.99f, 0.1f, 0f), "A"),
      (3L, Array(0.7f, 0.7f, 0f), "B"),
      (4L, Array(0f, 1f, 0f), "B"),
      (5L, Array(0f, 0f, 1f), null.asInstanceOf[String]) // unlabeled
    ).toDF("id", "vec", "label")
    val anchors = corpus.where(col("id") === 1)
      .select(col("id").as("qid"), col("vec").as("qvec"), col("label").as("qlabel"))
    val out = Similarity.hardNegatives(corpus, "id", "vec", "label",
        anchors, "qid", "qvec", "qlabel", k = 3)
      .select("rank", "id").as[(Int, Long)].collect().sortBy(_._1)
    // ranked by cosine to (1,0,0): 3 (0.707) > 5? no — 5 is orthogonal
    // (0.0) and 4 orthogonal (0.0), tie broken by id: 4 before 5.
    // Unlabeled 5 IS an eligible negative (null-safe inequality).
    assert(out.map(_._2).toSeq == Seq(3L, 4L, 5L), s"got ${out.toSeq}")
    assert(!out.map(_._2).contains(2L), "same-label near-dup leaked in")
  }

  test("keepBestRepresentatives keeps the argmax-score member, ties to smaller id") {
    // cluster {1,2,3} via chain 1-2, 2-3; best score is doc 3 (NOT the
    // min id q84's policy would keep); cluster {5,6} ties on score →
    // smaller id 5; doc 9 unclustered → always survives
    val docs = Seq(
      (1L, 0.2, "a"), (2L, 0.9, "b"), (3L, 0.9, "c"),
      (5L, 0.5, "d"), (6L, 0.5, "e"), (9L, 0.1, "f")
    ).toDF("id", "score", "tag")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.keepBestRepresentatives(docs, "id", "score", pairs)
      .select("id").as[Long].collect().toSet
    // {1,2,3}: ttr tie 2 vs 3 at 0.9 → smaller id 2; {5,6} → 5; 9 free
    assert(kept == Set(2L, 5L, 9L), s"got $kept")
    // and the min-id policy would have kept 1 — the policies genuinely differ
    val minId = Dedup.keepRepresentatives(docs, "id", pairs)
      .select("id").as[Long].collect().toSet
    assert(minId == Set(1L, 5L, 9L))
  }

  test("nbClassifierModel/linearScore match a hand-computed NB model") {
    import graft.functions.PortableSketches.lnOfPosLong
    val B = 4
    // training set: class 1 = {"aa aa bb"}, class 0 = {"cc", "cc dd"}
    val labeled = Seq(
      (1L, "aa aa bb", true),
      (2L, "cc", false),
      (3L, "cc dd", false)
    ).toDF("id", "text", "y")
    val (wDf, bias) = Relevance.nbClassifierModel(labeled, "text", "y", buckets = B)
    // replicate the hash recipe driver-side (8 md5 hex chars mod B)
    def bkt(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16) % B
    }
    val c1 = Map(bkt("aa") -> 2L, bkt("bb") -> 1L).withDefaultValue(0L) // 3 tokens
    val c0raw = Seq(bkt("cc"), bkt("cc"), bkt("dd"))
    val c0 = c0raw.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    val (ct1, ct0) = (3L, 3L)
    def expectW(b: Long): Double =
      lnOfPosLong(c1(b) + 1) - lnOfPosLong(ct1 + B) -
        (lnOfPosLong(c0(b) + 1)) + lnOfPosLong(ct0 + B)
    val got = wDf.orderBy("bucket").as[(Long, Double)].collect().toMap
    (0L until B).foreach { b =>
      assert(got(b) == expectW(b), s"bucket $b: ${got(b)} vs ${expectW(b)}")
    }
    // bias = ln(n1+1) − ln(n0+1) = ln 2 − ln 3
    val expBias = lnOfPosLong(2) - lnOfPosLong(3)
    // score "aa cc": w(aa)+w(cc) summed through DECIMAL(38,12) + bias
    val scored = Relevance.linearScore(
        Seq((9L, "aa cc")).toDF("id", "text"), "id", "text", wDf, bias, B)
      .select("id", "n_tokens", "score", "keep")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    def dec12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val expScore = (dec12(expectW(bkt("aa"))) + dec12(expectW(bkt("cc"))))
      .toDouble + expBias
    assert(scored == Seq((9L, 2L, expScore, expScore > 0.0)))
  }

  test("nbClassifier trained on half the corpus recovers the quality label on the held-out half") {
    // the fixture's lang/source columns are uncorrelated with its text
    // (one shared vocabulary — measured: lang-labeled training lands at
    // chance), so derive a learnable label: spam-marker tokens appended
    // to doc_id%3==0 docs, label = clean. The classifier sees TOKENS
    // only; held-out accuracy shows it generalizes past the train ids.
    val docs = graft.ops.Tables.table(spark, sf, "documents")
      .withColumn("text", when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" buy now click here free pills")))
        .otherwise(col("text")))
    val labeled = docs.where(col("doc_id") % 2 === 0)
      .withColumn("y", col("doc_id") % 3 =!= 0)
    val (w, bias) = Relevance.nbClassifierModel(labeled, "text", "y", buckets = 256)
    val heldOut = docs.where(col("doc_id") % 2 === 1)
    val scored = Relevance.linearScore(heldOut, "doc_id", "text", w, bias, 256)
      .join(heldOut.select(col("doc_id"), (col("doc_id") % 3 =!= 0).as("truth")), "doc_id")
    val (right, total) = (
      scored.where(col("keep") === col("truth")).count(),
      scored.count())
    assert(total > 100, s"held-out set too small: $total")
    assert(right.toDouble / total > 0.95,
      s"held-out accuracy ${right.toDouble / total} — the classifier learned nothing")
  }

  test("nbClassifierModel fails fast on a single-class training set") {
    val oneClass = Seq((1L, "aa", true), (2L, "bb", true)).toDF("id", "text", "y")
    val e = intercept[IllegalArgumentException] {
      Relevance.nbClassifierModel(oneClass, "text", "y", buckets = 4)
    }
    assert(e.getMessage.contains("BOTH classes"))
  }

  test("pqTopK: query/shortlist broadcasts obey the engine-wide size gate") {
    val corpus = (1 to 40).map { i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11 - 5).toFloat))
    }.toDF("id", "vec")
    val queries = corpus.where(col("id") < 4)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    def run(limit: Option[String]): (Seq[(Long, Int, Long)], String) = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      limit.foreach(spark.conf.set(Dedup.MaxBroadcastIdsKey, _))
      try {
        val out = graft.ops.Similarity.pqTopK(corpus, "id", "vec",
          queries, "qid", "qvec", k = 3, m = 4, ksub = 8)
        val rows = out.select("qid", "rank", "id").as[(Long, Int, Long)]
          .collect().toSeq.sorted
        (rows, out.queryExecution.executedPlan.toString)
      } finally {
        spark.conf.unset(Dedup.MaxBroadcastIdsKey)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    val (hinted, bcPlan) = run(None)
    assert(bcPlan.contains("Broadcast"),
      s"below the limit the query side must broadcast:\n$bcPlan")
    val (gated, shPlan) = run(Some("0"))
    assert(!shPlan.contains("Broadcast"),
      s"above the limit no forced broadcast may survive:\n$shPlan")
    assert(hinted == gated, "plan shape must not change results")
  }

  test("schema lint: complex top-level output columns are rejected, the catalog is clean") {
    import graft.queries.SchemaLint
    // planted offenders: each complex kind is caught with its name
    val planted = Seq((1L, Array(1.0, 2.0), Map("k" -> 1), (1, "s")))
      .toDF("id", "arr", "mp", "st")
    val bad = SchemaLint.complexTopLevel(planted.schema)
    assert(bad.size == 3 && bad.exists(_.startsWith("arr:")) &&
      bad.exists(_.startsWith("mp:")) && bad.exists(_.startsWith("st:")))
    // scalars pass
    assert(SchemaLint.complexTopLevel(planted.select("id").schema).isEmpty)
    // the q119 regression specifically: the catalog entry must emit 16
    // scalar double lanes, never the raw array (driver comparator crash,
    // round-7 CORRECTNESS q119)
    val q119 = graft.queries.Catalog.queries("q119_embed_project")(spark, sf)
    assert(SchemaLint.complexTopLevel(q119.schema).isEmpty)
    assert(q119.columns.toSeq == "vec_id" +: (0 until 16).map(j => f"p_$j%02d"))
  }

  test("IVF x int8 composition matches the float IVF scan on the same cells") {
    val emb = graft.ops.Tables.table(spark, sf, "embeddings")
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val float = sets(graft.ops.Similarity.ivfTopK(
      emb, "vec_id", "embedding", queries, "qid", "qvec", 5, nlist = 8, nprobe = 4))
    val quant = sets(graft.ops.Similarity.ivfTopKQuantized(
      emb, "vec_id", "embedding", queries, "qid", "qvec", 5, nlist = 8, nprobe = 4))
    val overlap = float.map { case (q, ns) =>
      (ns intersect quant.getOrElse(q, Set.empty)).size.toDouble / ns.size
    }.sum / float.size
    assert(overlap >= 0.8,
      s"quantized IVF diverged from float IVF on the same cells: $overlap")
  }

  test("decontamination: eval docs are fully contaminated, disjoint docs are clean") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),        // eval member
      (2L, "a b c d e f g h i j extra"),  // shares the eval 8-grams
      (3L, "q r s t u v w x y z")         // disjoint
    ).toDF("id", "text")
    val out = Decontamination.ngramOverlap(
        docs, "id", "text", docs.where($"id" === 1L), "text", n = 8)
      .orderBy("id").collect()
    assert(out(0).getDouble(3) == 1.0, s"eval doc must be 100% contaminated: ${out(0)}")
    assert(out(1).getLong(2) > 0, s"overlapping doc must be flagged: ${out(1)}")
    assert(out(2).getLong(2) == 0 && out(2).getDouble(3) == 0.0,
      s"disjoint doc must be clean: ${out(2)}")
  }

  test("decontamination join fallback computes identical overlap counts") {
    val docs = graft.ops.Tables.table(spark, sf, "documents")
    val eval = docs.where(col("doc_id") % 97 === 0)
    val a = Decontamination.ngramOverlap(docs, "doc_id", "text", eval, "text", n = 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = Decontamination.ngramOverlapJoin(docs, "doc_id", "text", eval, "text", n = 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq, "array-intersect and join variants must agree")
    val c = Decontamination.ngramOverlapJoinSalted(
        docs, "doc_id", "text", eval, "text", n = 8, saltFactor = 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq == c.toSeq, "salted shuffle-join variant must agree")
  }

  test("salted decontamination: disjoint eval set leaves every doc clean (left-outer edge)") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "k l m n o p q r s t")).toDF("id", "text")
    val eval = Seq((9L, "z y x w v u zz yy xx ww")).toDF("id", "text")
    val out = Decontamination.ngramOverlapJoinSalted(
        docs, "id", "text", eval, "text", n = 8, saltFactor = 4)
      .orderBy("id").collect()
    assert(out.length == 2, "left outer must keep every corpus doc")
    out.foreach { r =>
      assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0,
        s"no eval gram matches, doc must be clean: $r")
    }
  }

  test("unigram LM: common-token docs score likelier than rare-token docs") {
    val docs = Seq(
      (1L, "the the the cat"),   // all tokens frequent
      (2L, "zyx wvu qqq zzz"),   // all tokens unique → OOV at small vocabK
      (3L, "the cat zyx qqq")
    ).toDF("id", "text")
    val stats = graft.ops.TextOps.unigramStats(docs, "id", "text", vocabK = 2)
      .orderBy("id").collect()
    // vocab = {the, cat}: doc 1 fully in-vocab, doc 2 fully OOV
    assert(stats(0).getAs[Double]("oov_frac") == 0.0, s"doc1: ${stats(0)}")
    assert(stats(1).getAs[Double]("oov_frac") == 1.0 &&
      stats(1).getAs[Double]("mean_vocab_p") == 0.0, s"doc2: ${stats(1)}")
    assert(stats(0).getAs[Double]("mean_vocab_p") > stats(2).getAs[Double]("mean_vocab_p"),
      "frequent-token doc must have higher mean in-vocab probability")
    val lp = graft.ops.TextOps.unigramLogProb(docs, "id", "text", vocabK = 2)
      .orderBy("id").collect()
    assert(lp(0).getAs[Double]("mean_neg_logp") < lp(1).getAs[Double]("mean_neg_logp"),
      "surprisal must be lower for the frequent-token doc")
  }

  test("cross-corpus dedup finds pairs across sides and never within a side") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearCopy = ((1 to 39).map(i => s"tok$i") :+ "changed").mkString(" ")
    val existing = Seq((1L, base), (2L, "left-only words " + (50 to 90).map(i => s"x$i").mkString(" ")))
      .toDF("id", "text")
    val fresh = Seq((101L, nearCopy), (102L, "entirely different right side content here"),
      (103L, base)).toDF("id", "text")
    val pairs = Dedup.crossCorpusJaccardPairs(existing, fresh, "id", "text",
        shingleN = 3, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 101L), (1L, 103L)),
      s"expected the near-copy and exact copy flagged against doc 1, got $pairs")
  }

  test("keepRepresentatives: one survivor per cluster, singletons intact, string ids work") {
    // string ids exercise the convergence check that the numeric label
    // sum could not handle (clusters with diameter > 2)
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
      .toDF("id_a", "id_b")
    val docs = Seq("a", "b", "c", "d", "x", "y", "solo").toDF("id")
    val kept = Dedup.keepRepresentatives(docs, "id", pairs)
      .orderBy("id").collect().map(_.getString(0)).toSeq
    assert(kept == Seq("a", "solo", "x"),
      s"expected one rep per cluster + singleton, got $kept")
  }

  test("phraseSearch: adjacency semantics, overlap counting, multi-phrase") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b c"),          // "a a" overlaps: starts 1,2; "a a a" once
      (2L, "b c a a x a a"),      // "a a" twice, non-adjacent groups
      (3L, "c b a"),              // no "a a"
      (4L, "table hash table hash")) // repeated bigram, starts 1,3
      .toDF("doc_id", "text")
    val got = graft.ops.Relevance
      .phraseSearch(docs, "doc_id", "text", Seq("a a", "a a a", "table hash", "zz qq"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a a", 1L, 2L, 1L), ("a a", 2L, 2L, 3L),
      ("a a a", 1L, 1L, 1L),
      ("table hash", 4L, 2L, 1L)))
  }

  test("phraseSearch single-word phrase degenerates to term lookup") {
    import spark.implicits._
    val docs = Seq((1L, "x y x"), (2L, "y")).toDF("doc_id", "text")
    val got = graft.ops.Relevance.phraseSearch(docs, "doc_id", "text", Seq("x"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("x", 1L, 2L, 1L)))
  }

  test("postings index: probe equals inline search, append absorbs a crawl") {
    import spark.implicits._
    val pt = "postings_spec_idx"
    graft.ops.Tables.dropTablesAndDirs(spark, pt)
    val a = Seq((1L, "x y z x y"), (2L, "y z"), (3L, "q r")).toDF("doc_id", "text")
    val b = Seq((10L, "x y q"), (11L, "z z z")).toDF("doc_id", "text")
    graft.ops.Relevance.writePostingsIndex(a, "doc_id", "text", pt, numBuckets = 4)
    graft.ops.Relevance.appendToPostingsIndex(b, "doc_id", "text", pt, numBuckets = 4)
    val phrases = Seq("x y", "z z", "y z")
    val fromIdx = graft.ops.Relevance.phraseSearchFromIndex(spark, pt, phrases)
      .as[(String, Long, Long, Long)].collect().toSet
    val inline = graft.ops.Relevance.phraseSearch(a.unionAll(b), "doc_id", "text", phrases)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(fromIdx == inline)
    assert(fromIdx.contains(("z z", 11L, 2L, 1L)), s"overlap count from index: $fromIdx")
  }

  test("postings probe scans the index only, term filter pushed") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val pt = "postings_spec_idx" // built by the previous test
    val scans =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val probe = graft.ops.Relevance.phraseSearchFromIndex(spark, pt, Seq("x y"))
        // the operator caches its postings slice; drop the cache entry
        // BEFORE planning so the underlying file scan is visible
        spark.catalog.clearCache()
        probe.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(scans.nonEmpty)
    scans.foreach { sc =>
      val path = sc.relation.location.rootPaths.mkString(",")
      assert(path.contains(pt), s"probe must scan only the index, got $path")
      assert(sc.metadata.get("PushedFilters").exists(_.contains("In(term")),
        s"term filter must push to the index scan: ${sc.metadata.get("PushedFilters")}")
    }
  }

  test("bm25FromIndex matches inline bm25 and tracks appends") {
    import spark.implicits._
    val (pt, st) = ("bm25_spec_postings", "bm25_spec_stats")
    graft.ops.Tables.dropTablesAndDirs(spark, pt, st)
    // lowercase single-spaced corpus: inline bm25's regex tokenizer and
    // the index's raw space-split agree, so the two paths must match
    val a = Seq((1L, "spark table scan table"), (2L, "hash join table"),
      (3L, "sort merge join"), (4L, "scan scan scan")).toDF("doc_id", "text")
    val b = Seq((10L, "table table join"), (11L, "window agg")).toDF("doc_id", "text")
    val terms = Seq("table", "join", "scan")
    graft.ops.Relevance.writePostingsIndex(a, "doc_id", "text", pt,
      numBuckets = 4, statsTable = Some(st))
    graft.ops.Relevance.appendToPostingsIndex(b, "doc_id", "text", pt,
      numBuckets = 4, statsTable = Some(st))
    assert(spark.table(st).count() == 6, "stats must cover both crawls")
    val fromIdx = graft.ops.Relevance.bm25FromIndex(spark, pt, st, terms,
        logIdf = false)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val inline = graft.ops.Relevance.bm25(a.unionAll(b), "doc_id", "text",
        terms, logIdf = false)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(fromIdx.keySet == inline.keySet)
    fromIdx.foreach { case (id, (m, s)) =>
      assert(m == inline(id)._1, s"doc $id matched-term count")
      assert(math.abs(s - inline(id)._2) < 1e-9, s"doc $id: $s vs ${inline(id)._2}")
    }
  }

  test("quantized ANN paths: every query-batch broadcast obeys the size gate") {
    val emb = graft.ops.Tables.table(spark, sf, "embeddings")
    val queries = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def planAndRows(limit: Option[String],
                    f: () => org.apache.spark.sql.DataFrame): (String, Seq[(Long, Long)]) = {
      // autoBroadcastJoinThreshold=-1 keeps AQE from re-broadcasting the
      // tiny test side on its own, so the assertion sees the HINT's effect
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      limit.foreach(spark.conf.set(Dedup.MaxBroadcastIdsKey, _))
      try {
        val out = f()
        val rows = out.select("qid", "vec_id").as[(Long, Long)].collect().sorted.toSeq
        (out.queryExecution.executedPlan.toString, rows)
      } finally {
        spark.conf.unset(Dedup.MaxBroadcastIdsKey)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    // nprobe = nlist so the IVF search is exhaustive → identical results
    // in both plan modes is a strict requirement, not a recall accident
    val paths: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("bruteForceTopKQuantized", () =>
        graft.ops.Similarity.bruteForceTopKQuantized(emb, "vec_id", "embedding",
          queries, "qid", "qvec", 3)),
      ("ivfTopKQuantized", () =>
        graft.ops.Similarity.ivfTopKQuantized(emb, "vec_id", "embedding",
          queries, "qid", "qvec", 3, nlist = 4, nprobe = 4)),
      ("ivfTopK", () =>
        graft.ops.Similarity.ivfTopK(emb, "vec_id", "embedding",
          queries, "qid", "qvec", 3, nlist = 4, nprobe = 4)))
    for ((name, q) <- paths) {
      val (bc, rowsB) = planAndRows(None, q)
      assert(bc.contains("BroadcastExchange"),
        s"$name: expected hinted broadcasts below the limit:\n$bc")
      val (sh, rowsS) = planAndRows(Some("0"), q)
      assert(!sh.contains("BroadcastExchange"),
        s"$name: expected zero forced broadcasts above the limit:\n$sh")
      assert(rowsB == rowsS, s"$name: results must not depend on the plan mode")
    }
  }
}
