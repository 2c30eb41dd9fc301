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
}
