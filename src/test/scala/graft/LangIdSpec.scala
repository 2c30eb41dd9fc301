package graft

import org.apache.spark.sql.functions._

import graft.ops.{Relevance, Tables, TextOps}

/** Trained multiclass language ID (hashed char-trigram NB) vs the
  * stopword heuristic, on the orthography-injected corpus. */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private def derived = Tables.table(spark, sf, "documents")
    .select(col("doc_id"), col("lang"),
      TextOps.orthoInject(col("lang"), col("text")).as("__t"))

  test("the injection is live: every non-en lang's text actually changes") {
    val changed = Tables.table(spark, sf, "documents")
      .select(col("lang"),
        (TextOps.orthoInject(col("lang"), col("text")) =!= col("text"))
          .cast("long").as("c"))
      .groupBy("lang").agg(sum("c").as("n_changed"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((l, nc, n) <- changed) {
      if (l == "en") assert(nc == 0L, s"en must be identity, changed $nc")
      else assert(nc == n, s"$l: only $nc of $n docs changed — dead injection")
    }
  }

  test("held-out accuracy: trained model is (near-)perfect and beats the stopword baseline") {
    val d = derived
    val model = Relevance.nbMulticlassModel(
      d.where(col("doc_id") % 5 =!= 0), "__t", "lang")
    val heldOut = d.where(col("doc_id") % 5 === 0).cache()
    val preds = Relevance.nbClassify(heldOut, "doc_id", "__t", model)
      .join(heldOut.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val n = heldOut.count().toDouble
    val accTrained = preds.where(col("pred") === col("lang")).count() / n
    // the stopword heuristic on the SAME derived corpus: orthography
    // changes no stopword, so it cannot see the signal
    val accBaseline = heldOut
      .where(TextOps.langId(col("__t")) === col("lang")).count() / n
    assert(accTrained > 0.95,
      s"trained language ID should be near-perfect on injected signal, got $accTrained")
    assert(accTrained > accBaseline + 0.3,
      s"trained ($accTrained) must clearly beat the stopword baseline ($accBaseline)")
    heldOut.unpersist()
    ()
  }

  test("single-label training fails fast; sub-gram docs emit no row") {
    val one = Seq((1L, "en", "aaa bbb"), (2L, "en", "ccc ddd"))
      .toDF("id", "lang", "t")
    intercept[IllegalArgumentException] {
      Relevance.nbMulticlassModel(one, "t", "lang")
    }
    val two = Seq((1L, "x", "alpha beta gamma"), (2L, "y", "delta eps zeta"))
      .toDF("id", "lang", "t")
    val m = Relevance.nbMulticlassModel(two, "t", "lang")
    val scored = Relevance.nbClassify(
      Seq((10L, "ab"), (11L, "alpha beta")).toDF("id", "t"), "id", "t", m)
    val rows = scored.select("id", "pred").as[(Long, String)].collect().toMap
    assert(!rows.contains(10L), "a doc below the gram size must emit no row")
    assert(rows.get(11L).contains("x"))
  }

  test("nbCntGuard: passes below 10^7, raises a named error at the envelope") {
    val df = Seq((7L, 9999999L), (8L, 123L)).toDF("id", "cnt")
    val ok = df.select(Relevance.nbCntGuard(col("cnt"), col("id")).as("g"))
      .as[Long].collect().sorted
    assert(ok.toSeq == Seq(123L, 9999999L))
    val bad = Seq((42L, 10000000L)).toDF("id", "cnt")
    val e = intercept[Exception] {
      bad.select(Relevance.nbCntGuard(col("cnt"), col("id")).as("g")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("doc id 42") && m.contains("10^7")),
      s"error must name the document: ${msgs(e)}")
  }

  test("charGramsOf matches a reference JVM derivation incl. unicode") {
    val docs = Seq((1L, "abcde"), (2L, "ab"), (3L, ""),
      (4L, "dätä scän"), (5L, "的是不了"))
      .toDF("id", "t")
    val got = docs.select(col("id"), Relevance.charGramsOf("t", 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    def ref(s: String): Seq[String] =
      if (s.length < 3) Seq.empty
      else (0 to s.length - 3).map(i => s.substring(i, i + 3))
    for ((id, t) <- Seq((1L, "abcde"), (2L, "ab"), (3L, ""),
        (4L, "dätä scän"), (5L, "的是不了"))) {
      assert(got(id) == ref(t), s"grams diverge for '$t'")
    }
  }
}
