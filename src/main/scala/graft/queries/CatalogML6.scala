package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Incremental, QuantileSketch}
import graft.ops.Tables._

/** Round-10 additions — the q19x family: the portable mergeable
  * quantile sketch over continuous double domains (the round-9
  * verdict's top ask) and its state-as-data maintenance composition.
  * Bench reports them under the q19x rollup key; per-entry numbers via
  * SPARK_GRAFT_ONLY=q190,…
  */
object CatalogML6 {
  type Q = (SparkSession, String) => DataFrame

  private val S = QuantileSketch.DefaultS
  private val RevenueSql =
    "SELECT l_returnflag AS g, l_extendedprice * (1.0 - l_discount) AS v FROM lineitem"

  private def revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  def entries: Seq[(String, Q, Option[String])] = Seq(

    // Percentiles of a CONTINUOUS double (per-line revenue — one IEEE
    // multiply, bit-identical cross-engine) via the HDR log-linear
    // register sketch: corpus → (group, bucket, cnt) in one map-side-
    // combined exchange, quantile walk over the register table only,
    // estimate = the decoded bucket lower edge with a GUARANTEED
    // < 2^-7 relative error. The oracle re-derives the register ids
    // arithmetically (log2 corrected by exact power-of-two compares —
    // no IEEE bit access in SQL) and replays the walk; matching hashes
    // prove both engines computed identical registers AND identical
    // decoded estimates.
    ("q190_quantile_sketch", (s: SparkSession, d: String) => {
      QuantileSketch.quantilesOf(
        spread(table(s, d, "lineitem"), "l_orderkey"), "l_returnflag",
        revenue, Seq(25, 50, 75, 95, 99), S)
        .orderBy("l_returnflag", "pct")
    }, Some(
      QuantileSketch.quantilesSql(
        QuantileSketch.sketchSql(RevenueSql, S),
        Seq(25, 50, 75, 95, 99), S, gAs = "l_returnflag") +
        "\nORDER BY l_returnflag, pct")),

    // Maintained percentile state: three epoch sketches folded into a
    // persisted register table via the generic monoid advance
    // (sum(cnt) per (group, bucket) — commutative, so epochs land in
    // any order), quantiles answered FROM THE STATE with no corpus
    // rescan. The oracle replays the from-scratch whole-corpus sketch:
    // equality IS the merge-equals-whole law, checked to the hash.
    ("q191_quantile_sketch_state", (s: SparkSession, d: String) => {
      val tag = Integer.toHexString(d.hashCode)
      val st = s"q191_state_$tag"
      graft.ops.Tables.dropTablesAndDirs(s, st, s"${st}__next", s"${st}__old")
      val li = table(s, d, "lineitem")
      QuantileSketch.sketch(li.where(expr("l_orderkey % 3 = 0")),
          "l_returnflag", revenue, S)
        .write.saveAsTable(st)
      for (m <- 1 to 2)
        Incremental.advanceStateTableBy(s, st,
          QuantileSketch.sketch(li.where(expr(s"l_orderkey % 3 = $m")),
            "l_returnflag", revenue, S),
          Seq("l_returnflag", "bucket"), QuantileSketch.mergeAggs)
      QuantileSketch.quantiles(s.table(st), "l_returnflag",
          Seq(50, 90, 99), S)
        .orderBy("l_returnflag", "pct")
    }, Some(
      QuantileSketch.quantilesSql(
        QuantileSketch.sketchSql(RevenueSql, S),
        Seq(50, 90, 99), S, gAs = "l_returnflag") +
        "\nORDER BY l_returnflag, pct")),

    // The documents-based sketch entry (rides the ScalingCurve
    // bijective-expansion harness, which only expands documents/
    // embeddings): per-language percentiles of average token length —
    // a QUOTIENT double (q32's proven-portable expression), i.e. a
    // genuinely continuous domain where the counting CDF would be
    // corpus-sized. Same register pipeline as q190.
    ("q192_quantile_sketch_docs", (s: SparkSession, d: String) => {
      val nTokens = size(split(trim(col("text")), "\\s+"))
      val v = length(regexp_replace(col("text"), " ", "")).cast("double") /
        nTokens.cast("double")
      QuantileSketch.quantilesOf(
        spread(table(s, d, "documents"), "doc_id")
          .select(col("lang"), v.as("__v")),
        "lang", col("__v"), Seq(10, 50, 90), S)
        .orderBy("lang", "pct")
    }, Some(
      QuantileSketch.quantilesSql(
        QuantileSketch.sketchSql(
          "SELECT lang AS g, CAST(length(replace(text, ' ', '')) AS DOUBLE)" +
            " / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)" +
            " AS v FROM documents", S),
        Seq(10, 50, 90), S, gAs = "lang") +
        "\nORDER BY lang, pct")),

    // TRAINED language ID — multiclass hashed char-trigram NB replacing
    // the q39 stopword heuristic for orthographic signal. The fixture's
    // text is language-blind (same vocabulary for every lang), so the
    // query derives a realistic multilingual corpus by the q164
    // injection pattern (per-lang character translate from shared
    // literals, both engines), trains on the doc_id%5!=0 split, and
    // reports the held-out CONFUSION MATRIX. Train + score replay
    // verbatim in DuckDB (md5 buckets, integer-ln weights,
    // DECIMAL(38,12) sums, score-then-label argmax) — a fully-oracled
    // trained classifier, the q136 discipline at C classes.
    ("q194_langid_trained", (s: SparkSession, d: String) => {
      import graft.ops.{Relevance, TextOps}
      val derived = table(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.orthoInject(col("lang"), col("text")).as("__t"))
      val model = Relevance.nbMulticlassModel(
        derived.where(col("doc_id") % 5 =!= 0), "__t", "lang")
      Relevance.nbClassify(derived.where(col("doc_id") % 5 === 0),
          "doc_id", "__t", model)
        .join(derived.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "pred")
    }, Some {
      import graft.functions.PortableSketches.lnOfIntSql
      val inject = graft.ops.TextOps.orthoInjectSql("lang", "text")
      s"""WITH base AS (
         |  SELECT doc_id, lang, $inject AS t FROM documents
         |), gb AS (
         |  SELECT doc_id, lang,
         |         ('0x' || substr(md5(g), 1, 8))::BIGINT % 1024 AS bucket
         |  FROM (
         |    SELECT doc_id, lang, substr(t, i, 3) AS g
         |    FROM (SELECT doc_id, lang, t,
         |                 unnest(generate_series(1, greatest(len(t) - 2, 0)))
         |                   AS i
         |          FROM base))
         |), tr AS (SELECT * FROM gb WHERE doc_id % 5 <> 0),
         |cnt AS (
         |  SELECT lang AS label, bucket, CAST(count(*) AS BIGINT) AS c
         |  FROM tr GROUP BY 1, 2
         |), tot AS (SELECT label, CAST(sum(c) AS BIGINT) AS ct FROM cnt GROUP BY 1),
         |nd AS (
         |  SELECT lang AS label, CAST(count(*) AS BIGINT) AS ndoc
         |  FROM base WHERE doc_id % 5 <> 0 GROUP BY 1
         |), grid AS (
         |  SELECT label, i AS bucket
         |  FROM tot, (SELECT unnest(generate_series(0, 1023)) AS i)
         |), model AS (
         |  SELECT g.label, g.bucket,
         |         ${lnOfIntSql("(COALESCE(c.c, 0) + 1)")}
         |           - ${lnOfIntSql("(t2.ct + 1024)")} AS w,
         |         ${lnOfIntSql("(nd.ndoc + 1)")} AS prior
         |  FROM grid g
         |  LEFT JOIN cnt c ON c.label = g.label AND c.bucket = g.bucket
         |  JOIN tot t2 ON t2.label = g.label
         |  JOIN nd ON nd.label = g.label
         |), te AS (SELECT * FROM gb WHERE doc_id % 5 = 0),
         |sc AS (
         |  SELECT te.doc_id, m.label,
         |         CAST(sum(CAST(m.w AS DECIMAL(38,12))) AS DOUBLE)
         |           + min(m.prior) AS score
         |  FROM te JOIN model m ON m.bucket = te.bucket
         |  GROUP BY 1, 2
         |), best AS (
         |  SELECT doc_id, label AS pred,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY score DESC, label DESC) AS rn
         |  FROM sc
         |)
         |SELECT b.lang, best.pred, CAST(count(*) AS BIGINT) AS n_docs
         |FROM best JOIN (SELECT DISTINCT doc_id, lang FROM base) b
         |  USING (doc_id)
         |WHERE rn = 1
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin
    }),

    // The trained classifier COMPOSED into the corpus pipeline (the
    // q77 posture with the q194 model replacing the stopword
    // heuristic): inject → exact-dedup (q31's keep-min-id) → train on
    // the survivors' %5 split → classify EVERY survivor → per-predicted-
    // language report with a correctness column. Checks the stages
    // compose exactly, not just individually.
    ("q195_pipeline_langid_trained", (s: SparkSession, d: String) => {
      import graft.ops.{Dedup, Relevance, TextOps}
      val derived = table(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.orthoInject(col("lang"), col("text")).as("__t"))
      val kept = Dedup.dropExactDuplicates(derived, "doc_id", "__t")
      val model = Relevance.nbMulticlassModel(
        kept.where(col("doc_id") % 5 =!= 0), "__t", "lang")
      Relevance.nbClassify(kept, "doc_id", "__t", model)
        .join(kept.select(col("doc_id"), col("lang"), col("__t")),
          Seq("doc_id"))
        .groupBy(col("pred"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("lang") === col("pred")).cast("long")).as("n_correct"),
          sum(length(col("__t")).cast("long")).as("total_chars"))
        .orderBy("pred")
    }, Some {
      import graft.functions.PortableSketches.lnOfIntSql
      val inject = graft.ops.TextOps.orthoInjectSql("lang", "text")
      s"""WITH base AS (
         |  SELECT doc_id, lang, $inject AS t FROM documents
         |), kept AS (
         |  SELECT doc_id, lang, t FROM (
         |    SELECT b.*, min(doc_id) OVER (PARTITION BY md5(t)) AS kid
         |    FROM base b)
         |  WHERE doc_id = kid
         |), gb AS (
         |  SELECT doc_id, lang,
         |         ('0x' || substr(md5(g), 1, 8))::BIGINT % 1024 AS bucket
         |  FROM (
         |    SELECT doc_id, lang, substr(t, i, 3) AS g
         |    FROM (SELECT doc_id, lang, t,
         |                 unnest(generate_series(1, greatest(len(t) - 2, 0)))
         |                   AS i
         |          FROM kept))
         |), tr AS (SELECT * FROM gb WHERE doc_id % 5 <> 0),
         |cnt AS (
         |  SELECT lang AS label, bucket, CAST(count(*) AS BIGINT) AS c
         |  FROM tr GROUP BY 1, 2
         |), tot AS (SELECT label, CAST(sum(c) AS BIGINT) AS ct FROM cnt GROUP BY 1),
         |nd AS (
         |  SELECT lang AS label, CAST(count(*) AS BIGINT) AS ndoc
         |  FROM kept WHERE doc_id % 5 <> 0 GROUP BY 1
         |), grid AS (
         |  SELECT label, i AS bucket
         |  FROM tot, (SELECT unnest(generate_series(0, 1023)) AS i)
         |), model AS (
         |  SELECT g.label, g.bucket,
         |         ${lnOfIntSql("(COALESCE(c.c, 0) + 1)")}
         |           - ${lnOfIntSql("(t2.ct + 1024)")} AS w,
         |         ${lnOfIntSql("(nd.ndoc + 1)")} AS prior
         |  FROM grid g
         |  LEFT JOIN cnt c ON c.label = g.label AND c.bucket = g.bucket
         |  JOIN tot t2 ON t2.label = g.label
         |  JOIN nd ON nd.label = g.label
         |), sc AS (
         |  SELECT gb.doc_id, m.label,
         |         CAST(sum(CAST(m.w AS DECIMAL(38,12))) AS DOUBLE)
         |           + min(m.prior) AS score
         |  FROM gb JOIN model m ON m.bucket = gb.bucket
         |  GROUP BY 1, 2
         |), best AS (
         |  SELECT doc_id, label AS pred,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY score DESC, label DESC) AS rn
         |  FROM sc
         |)
         |SELECT best.pred,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CAST(k.lang = best.pred AS BIGINT)) AS BIGINT)
         |         AS n_correct,
         |       CAST(sum(len(k.t)) AS BIGINT) AS total_chars
         |FROM best JOIN kept k USING (doc_id)
         |WHERE rn = 1
         |GROUP BY 1
         |ORDER BY 1""".stripMargin
    })
  )
}
