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
        "\nORDER BY lang, pct"))
  )
}
