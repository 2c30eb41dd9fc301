package graft

import org.apache.spark.sql.functions._

import graft.ops.{Sampling, Tables}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("splits are disjoint, exhaustive, partitioning-independent, and near the fractions") {
    val docs = Tables.table(spark, sf, "documents")
    val split = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 500)
    assert(counts("train") > 350 && counts("train") < 450, s"got $counts")
    // membership is a pure function of the id: repartitioning changes nothing
    val again = Sampling.deterministicSplit(docs.repartition(7), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val first = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(first == again)
  }

  test("stratified sample keeps ~fraction of each stratum and is deterministic") {
    val docs = Tables.table(spark, sf, "documents")
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.5), default = 0.0)
    val byLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("en") == totals("en"))
    assert(byLang.getOrElse("fr", 0L) == 0L)
    val de = byLang.getOrElse("de", 0L).toDouble / totals("de")
    assert(de > 0.25 && de < 0.75, s"de fraction $de")
    assert(sampled.count() == Sampling.stratifiedSample(docs.repartition(5),
      "doc_id", "lang", Map("en" -> 1.0, "de" -> 0.5)).count())
  }

  test("fixed-size per-group sample is exact-size and partitioning-independent") {
    val docs = Tables.table(spark, sf, "documents")
    val sample = Sampling.fixedSizePerGroup(docs, "doc_id", "lang", n = 10)
    val sizes = sample.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    totals.foreach { case (l, t) =>
      assert(sizes.getOrElse(l, 0L) == math.min(10L, t), s"$l: $sizes vs $totals")
    }
    val again = Sampling.fixedSizePerGroup(docs.repartition(7), "doc_id", "lang", n = 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(sample.select("doc_id").as[Long].collect().sorted.toSeq == again)
  }

  test("temperature weights flatten the mixture; T=1 keeps natural shares") {
    // group by lang — the fixture's lang mixture is skewed (source is
    // uniform, which a temperature rescale would leave unchanged)
    val docs = Tables.table(spark, sf, "documents")
    val natural = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = natural.values.sum.toDouble
    val t2 = Sampling.temperatureWeights(docs, "lang", temperature = 2.0)
      .select("lang", "target_frac").as[(String, Double)].collect().toMap
    assert(math.abs(t2.values.sum - 1.0) < 1e-9, s"fractions must sum to 1: $t2")
    val (maxSrc, _) = natural.maxBy(_._2)
    val (minSrc, _) = natural.minBy(_._2)
    // T=2 moves both extremes toward uniform
    assert(t2(maxSrc) < natural(maxSrc) / total, s"big group must shrink: $t2 vs $natural")
    assert(t2(minSrc) > natural(minSrc) / total, s"small group must grow: $t2 vs $natural")
    // T=1 (libm-pow path) reproduces the natural mixture
    val t1 = Sampling.temperatureWeights(docs, "lang", temperature = 1.0)
      .select("lang", "target_frac").as[(String, Double)].collect().toMap
    natural.foreach { case (srcName, n) =>
      assert(math.abs(t1(srcName) - n / total) < 1e-6, s"T=1 must be natural: $t1")
    }
  }

  test("temperature sampling hits per-group targets and stays deterministic") {
    val docs = Tables.table(spark, sf, "documents")
    val target = 300L
    val sampled = Sampling.temperatureSample(docs, "doc_id", "source", target)
    val got = sampled.groupBy("source").count().as[(String, Long)].collect().toMap
    val want = Sampling.temperatureWeights(docs, "source")
      .select("source", "target_frac").as[(String, Double)].collect().toMap
    got.foreach { case (srcName, n) =>
      val expected = want(srcName) * target
      assert(math.abs(n - expected) < math.max(20, expected * 0.5),
        s"$srcName: got $n, expected ~$expected")
    }
    // pure-hash membership: repartitioning cannot change the sample
    val again = Sampling.temperatureSample(docs.repartition(7), "doc_id", "source", target)
    assert(sampled.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("epoch shuffle: reproducible shards/order per epoch, re-dealt across epochs") {
    import org.apache.spark.sql.functions._
    val df = (1L to 200L).toDF("id")
    def run(epoch: Long, input: org.apache.spark.sql.DataFrame = df) =
      Sampling.epochShuffle(input, "id", epoch, numShards = 4)
        .select("id", "shard", "seq")
        .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    val e1 = run(1L)
    // exhaustive, shards in range, seq contiguous 1..|shard| within shards
    assert(e1.map(_._1).toSet == (1L to 200L).toSet)
    assert(e1.forall { case (_, s, _) => s >= 0 && s < 4 })
    e1.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size.toLong),
        s"seq not contiguous in shard $s")
    }
    // bit-reproducible across runs AND partitionings
    assert(run(1L) == e1)
    assert(run(1L, df.repartition(13)) == e1)
    // a different epoch re-deals: some id changes shard or position
    val e2 = run(2L)
    assert(e2 != e1, "epoch 2 produced the identical deal")
    // no global sort: the executed plan exchanges by shard only
    val out = Sampling.epochShuffle(df, "id", 1L, numShards = 4)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"epoch shuffle must not global-sort:\n$plan")
  }
}
