package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword relevance scoring (BM25) over a document corpus — the ranking
  * primitive a training-data pipeline uses to mine topic-focused subsets
  * ("give me the most spark-like documents") or to build retrieval eval
  * sets from raw text.
  *
  * Scale design: the query's term list is tiny and fixed, so term
  * frequencies are computed as PER-ROW expressions over the token array
  * (`size(filter(tokens, _ == term))`) — no explode, no per-token
  * shuffle. The only aggregation is a single global one-row reduction for
  * corpus stats (N, avgdl, per-term document frequencies), which Spark
  * executes as partial aggregates merged to one row; that row is then
  * broadcast back with a literal cross join. Two passes over the corpus,
  * zero wide shuffles, codegen end to end — the plan a 100 TB scorer
  * needs.
  *
  * Determinism: per-document scores sum the per-term contributions in
  * the FIXED order of the terms list (a left-folded `+` chain), so the
  * result is bit-stable under any partitioning. With `logIdf = false`
  * the idf stays the raw Robertson-Sparck-Jones odds ratio
  * `(N - df + 0.5) / (df + 0.5)` — rational arithmetic only, which is
  * also bit-reproducible across engines (used by the differential
  * oracle); `logIdf = true` applies the standard `ln(1 + odds)`
  * compression (libm log is engine-specific at the last ulp, so this
  * variant is pinned by unit tests rather than the cross-engine oracle).
  */
object Relevance {

  /** BM25 scores for `terms` over `docs`. Emits (idCol, n_terms_matched,
    * score) for documents matching at least one term.
    *
    * @param logIdf standard log-compressed idf (default); false = raw
    *               odds-ratio idf, bit-reproducible across engines
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75, logIdf: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = TextOps.lowerTokens(col(textCol))
    def tfCol(i: Int) = col(s"tf_$i")
    def dfCol(i: Int) = col(s"df_$i")
    val perDoc = docs.select(
      col(idCol) +:
        size(toks).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t.toLowerCase))).cast("double").as(s"tf_$i")
        }: _*)
    // one-row corpus stats: N, Σdl (exact in long — dl is an int count),
    // and per-term document frequency
    val statCols =
      count(lit(1)).cast("double").as("n_docs") +:
        sum(col("dl").cast("long")).as("sum_dl") +:
        terms.indices.map(i =>
          sum((tfCol(i) > 0d).cast("long")).cast("double").as(s"df_$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    def idf(i: Int): Column = {
      val odds = (col("n_docs") - dfCol(i) + lit(0.5)) / (dfCol(i) + lit(0.5))
      if (logIdf) log(lit(1.0) + odds) else odds
    }
    // per-term contribution, summed in fixed term order (bit-stable)
    def contrib(i: Int): Column =
      idf(i) * (tfCol(i) * (lit(k1) + lit(1.0)) /
        (tfCol(i) + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (col("dl") / avgdl))))
    val score = terms.indices.map(contrib).reduceLeft(_ + _)
    val matched = terms.indices
      .map(i => (tfCol(i) > 0d).cast("int")).reduceLeft(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .where(matched > 0)
      .select(col(idCol), matched.cast("long").as("n_terms_matched"),
        score.as("score"))
  }
}
