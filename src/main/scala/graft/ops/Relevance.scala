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
    def tfCol(i: Int) = col(s"tf_$i")
    def dfCol(i: Int) = col(s"df_$i")
    // tokenize ONCE into a column: the dl size and every per-term filter
    // read the same array — inlining the tokenization expression would
    // re-run the regex split + lowercasing 1 + |terms| times per row
    // (interpreted HOFs get no common-subexpression elimination)
    val perDoc = docs
      .select(col(idCol), TextOps.lowerTokens(col(textCol)).as("__toks"))
      .select(
        col(idCol) +:
          size(col("__toks")).cast("double").as("dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            size(filter(col("__toks"), x => x === lit(t.toLowerCase)))
              .cast("double").as(s"tf_$i")
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

  /** Batch BM25 retrieval: top-`k` documents per query, for a TABLE of
    * queries (qidCol, termsCol: array<string>) — the multi-query search
    * shape, where the term set is data, not literals.
    *
    * Scale design: the query vocabulary (distinct terms over all
    * queries) broadcasts, so the corpus-token explode is filtered to
    * query terms immediately — per-(term, doc) counts partial-aggregate
    * map-side, and everything after operates on the matched subset. The
    * per-query top-k is a rank window over (qid, doc, score) rows only.
    *
    * Determinism: per-(query, doc) scores sum the per-term
    * contributions through DECIMAL(18,12) — exact and
    * accumulation-order-independent, so ranking is stable under any
    * partitioning (and bit-reproducible cross-engine with
    * `logIdf = false`, which the differential oracle uses). */
  def bm25SearchTopK(docs: DataFrame, idCol: String, textCol: String,
                     queries: DataFrame, qidCol: String, termsCol: String,
                     k: Int, k1: Double = 1.2, b: Double = 0.75,
                     logIdf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val base = docs.select(col(idCol),
        TextOps.lowerTokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("double").as("dl"), col("__toks"))
    val qexp = queries.select(col(qidCol),
      explode(transform(col(termsCol), t => lower(t))).as("term"))
    val qvocab = qexp.select("term").distinct()
    val tf = base
      .select(col(idCol), col("dl"), explode(col("__toks")).as("term"))
      .join(broadcast(qvocab), Seq("term"))
      .groupBy(col("term"), col(idCol), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val odds = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val idf = if (logIdf) log(lit(1.0) + odds) else odds
    val contrib = idf * (col("tf") * (lit(k1) + lit(1.0)) /
      (col("tf") + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (col("dl") / avgdl))))
    val scores = tf
      .join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qexp), Seq("term"))
      .withColumn("__c", contrib.cast(DecimalType(18, 12)))
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("__c")).cast("double").as("score"),
        count(lit(1)).as("n_terms_matched"))
    val w = Window.partitionBy(qidCol).orderBy(col("score").desc, col(idCol).asc)
    scores.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("score"),
        col("n_terms_matched"))
  }

  // ───────────────── DSIR importance resampling (data selection) ──────────

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every raw-corpus document by how target-domain-like it is under
    * hashed bag-of-tokens language models —
    * `log w(x) = Σ_tokens [log p_target(b(t)) − log p_raw(b(t))]` with
    * tokens hashed into `buckets` features (the paper's hashed n-gram
    * trick) and add-one smoothing on both models. The standard way to
    * carve a domain-focused training subset out of a web-scale crawl
    * when all you have is a small in-domain sample.
    *
    * Scale design: the two models collapse to ONE `buckets`-row ratio
    * table (per-bucket `log p_t − log p_r`, broadcast); the corpus-side
    * stream that shuffles is (id, bucket) pairs feeding a partial-agg
    * sum — same envelope as the other token-stream operators. The
    * target sample is assumed small (a curated in-domain set), but
    * nothing breaks if it is not: only its bucket HISTOGRAM is ever
    * aggregated, never its rows.
    *
    * Determinism/portability: token hash = first 8 md5 hex chars mod
    * `buckets` (nonnegative, engine-identical); logs via the
    * bit-portable integer-ln series
    * ([[graft.functions.PortableSketches.lnOfInt]] — every smoothed
    * count and denominator is a positive integer); the per-document sum
    * runs in exact DECIMAL(38,12), so the whole operator carries a full
    * differential oracle. Documents with zero tokens produce no rows.
    *
    * Returns (idCol, n_tokens, logw). `textCol` must exist in BOTH
    * frames. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    // fail fast, not silently: an empty target makes the total-count
    // row NULL, which would propagate NULL into every logratio and
    // every doc's logw — downstream top-k would then "select" the k
    // smallest ids as if they were the most target-like documents
    require(!target.isEmpty,
      "DSIR target frame is empty — importance weights would be NULL for every document")
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.PortableSketches.lnOfInt
    val spark = raw.sparkSession
    // the shared portable recipe — linearScore's weight-table
    // compatibility contract depends on both using ONE definition
    def bucketOf(t: Column): Column = tokenBucket(t, buckets)
    def bucketCounts(df: DataFrame, cntName: String): DataFrame =
      df.select(explode(TextOps.lowerTokens(col(textCol))).as("__tok"))
        .select(bucketOf(col("__tok")).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(cntName))
    val tCnt = bucketCounts(target, "__tc")
    val rCnt = bucketCounts(Tables.spread(raw, idCol), "__rc")
    val tTot = tCnt.agg(sum(col("__tc")).as("__tt"))
    val rTot = rCnt.agg(sum(col("__rc")).as("__rt"))
    // one ratio row per bucket, including never-seen buckets (smoothed);
    // evaluation order of the ln chain is fixed left-assoc and mirrored
    // verbatim by the oracle SQL
    val ratio = spark.range(buckets.toLong).select(col("id").as("bucket"))
      .join(tCnt, Seq("bucket"), "left")
      .join(rCnt, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      .select(col("bucket"),
        (lnOfInt(coalesce(col("__tc"), lit(0L)) + lit(1L))
          - lnOfInt(col("__tt") + lit(buckets.toLong))
          - lnOfInt(coalesce(col("__rc"), lit(0L)) + lit(1L))
          + lnOfInt(col("__rt") + lit(buckets.toLong))).as("logratio"))
    Tables.spread(raw, idCol)
      .select(col(idCol), explode(TextOps.lowerTokens(col(textCol))).as("__tok"))
      .select(col(idCol), bucketOf(col("__tok")).as("bucket"))
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("logratio").cast(DecimalType(38, 12))).cast("double").as("logw"))
  }

  /** Deterministic DSIR selection: top-`k` documents by importance
    * weight, ties to the smaller id. For the paper's actual sampling
    * policy see [[dsirGumbelTopK]]. Plans as TakeOrderedAndProject —
    * no global sort materializes. */
  def dsirTopK(weights: DataFrame, idCol: String, k: Int): DataFrame =
    weights.orderBy(col("logw").desc, col(idCol).asc).limit(k)

  /** Seeded Gumbel-top-k DSIR selection — the paper's resampling
    * policy, not just the argmax: keeping the `k` largest
    * `logw_i + g_i` with `g_i` i.i.d. standard Gumbel draws samples k
    * documents WITHOUT replacement with probability ∝ exp(logw_i)
    * (the Gumbel-top-k trick), preserving diversity that a plain
    * top-k by weight destroys.
    *
    * The noise is a pure function of (seed, id) — reproducible across
    * runs, partitionings, and engines: u = (h+1)/(2^24+1) from 24 md5
    * bits of `seed:id`, g = −ln(−ln u) with BOTH logs through the
    * bit-portable integer-ln series. The outer log's argument is a
    * double, so it is quantized to 2^−40 first (an exact ×2^40 scale +
    * exact floor — both IEEE-exact, hence engine-identical); the
    * deviation from an ideal Gumbel is ≤ ~1.5e-5 and only in the
    * extreme tail (u within 6e-8 of 1), a DEFINED deterministic
    * function rather than an approximation drift — which is what lets
    * this carry a full differential oracle where libm-based sampling
    * could not. Plans as TakeOrderedAndProject, same as [[dsirTopK]].
    *
    * Returns the weight columns + `gkey` (the perturbed key actually
    * ranked). */
  def dsirGumbelTopK(weights: DataFrame, idCol: String, k: Int,
                     seed: Long): DataFrame = {
    // lnOfIntFast, not the lnOfInt Column macro: the key nests a ln
    // inside a ln, and the macro's ~30× argument substitution turned
    // the nested tree into ~900 md5/conv nodes — measured ~8 s of
    // plan-evaluation overhead at x1 and growing with the corpus. The
    // compiled node is bit-identical (differential spec) and keeps the
    // projection constant-size.
    import graft.functions.PortableSketches.{lnOfIntFast, Ln2}
    val h24 = conv(substring(
      md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string"))),
      1, 6), 16, 10).cast("long")
    // t = −ln u = ln(2^24+1) − ln(h+1), strictly positive
    val t = lnOfIntFast(lit((1L << 24) + 1L)) - lnOfIntFast(h24 + lit(1L))
    // exact power-of-two scale + exact floor → portable integer mantissa
    val m = floor(t * lit(1.099511627776e12)) // 2^40
    val g = -(lnOfIntFast(m) - lit(40.0 * Ln2))
    weights
      .withColumn("gkey", col("logw") + g)
      .orderBy(col("gkey").desc, col(idCol).asc)
      .limit(k)
  }

  // --- Trained quality classifier (hashed Naive-Bayes linear model) ----

  /** Portable token→bucket hash (the [[dsirWeights]] recipe: 8 md5 hex
    * chars as a 32-bit int mod B — replayable verbatim in any SQL
    * engine). */
  private def tokenBucket(t: Column, buckets: Int): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long") % buckets

  /** Train a hashed LINEAR text classifier in ONE aggregation pass —
    * the fastText-style quality gate a production corpus pipeline runs
    * beside the Gopher rule filters: label a seed set (human marks,
    * a reference corpus vs crawl, an LLM judge), train, score the
    * whole corpus with one broadcast weight table.
    *
    * The trainer is multinomial Naive Bayes with add-one smoothing
    * over hashed token buckets — the member of the linear-model family
    * that trains in a single counting pass (an SGD logistic fit shares
    * the SCORING shape below but not one-pass trainability):
    *
    *   w_b  = ln(c1_b+1) − ln(C1+B) − ln(c0_b+1) + ln(C0+B)
    *   bias = ln(n1+1) − ln(n0+1)
    *
    * where c/C are per-class bucket/total token counts and n1/n0 the
    * class doc counts. `bias + Σ_tok w_bucket(tok)` is then the NB
    * log-odds ln p(1|d) − ln p(0|d). Every ln argument is a positive
    * integer, so the logs run through the bit-portable integer-ln
    * series — the whole train+score pipeline carries a full
    * differential oracle (q136), which a libm-log or SGD model could
    * not.
    *
    * Scale: one explode → (bucket, c1, c0) partial-agg shuffle
    * (bucket-table-sized), one-row token totals, one-row doc totals
    * (collected — model-sized, like every model collect in this repo);
    * the returned weight table is B rows. Returns (weights(bucket, w),
    * bias). */
  def nbClassifierModel(labeled: DataFrame, textCol: String, labelCol: String,
                        buckets: Int = 1024): (DataFrame, Column) = {
    import graft.functions.PortableSketches.lnOfInt
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = labeled.sparkSession
    val y = col(labelCol).cast("boolean")
    // fail fast on a degenerate training set: a missing class would
    // otherwise silently train a constant scorer
    val docTot = labeled.agg(
      sum(when(y, 1L).otherwise(0L)).as("n1"),
      sum(when(!y, 1L).otherwise(0L)).as("n0")).collect()(0)
    val (n1, n0) = (Option(docTot.get(0)).fold(0L)(_ => docTot.getLong(0)),
      Option(docTot.get(1)).fold(0L)(_ => docTot.getLong(1)))
    require(n1 > 0 && n0 > 0,
      s"classifier training needs BOTH classes, got n1=$n1 n0=$n0")
    val cnt = labeled
      .select(y.as("__y"), explode(TextOps.lowerTokens(col(textCol))).as("__tok"))
      .select(col("__y"), tokenBucket(col("__tok"), buckets).as("bucket"))
      .groupBy("bucket").agg(
        sum(when(col("__y"), 1L).otherwise(0L)).as("__c1"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("__c0"))
    val tot = cnt.agg(sum(col("__c1")).as("__ct1"), sum(col("__c0")).as("__ct0"))
    val weights = spark.range(buckets.toLong).select(col("id").as("bucket"))
      .join(cnt, Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        (lnOfInt(coalesce(col("__c1"), lit(0L)) + lit(1L))
          - lnOfInt(col("__ct1") + lit(buckets.toLong))
          - lnOfInt(coalesce(col("__c0"), lit(0L)) + lit(1L))
          + lnOfInt(col("__ct0") + lit(buckets.toLong))).as("w"))
    val bias = lnOfInt(lit(n1 + 1L)) - lnOfInt(lit(n0 + 1L))
    (weights, bias)
  }

  /** Score documents under a hashed linear model — one broadcast of
    * the B-row weight table, one explode, one per-doc exact
    * DECIMAL(38,12) sum; `keep` = score > 0. Generic over the weight
    * source ([[nbClassifierModel]] or any externally trained table
    * with the same (bucket, w) shape and hash recipe). Docs with zero
    * tokens emit no row (the [[dsirWeights]] contract). */
  def linearScore(docs: DataFrame, idCol: String, textCol: String,
                  weights: DataFrame, bias: Column,
                  buckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    Tables.spread(docs, idCol)
      .select(col(idCol), explode(TextOps.lowerTokens(col(textCol))).as("__tok"))
      .select(col(idCol), tokenBucket(col("__tok"), buckets).as("bucket"))
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("w").cast(DecimalType(38, 12))).as("__sw"))
      .select(col(idCol), col("n_tokens"),
        (col("__sw").cast("double") + bias).as("score"))
      .withColumn("keep", col("score") > lit(0.0))
  }

  // --- Trained multiclass language ID (hashed char-ngram NB) -----------

  /** Character n-grams of a projected string column (by NAME — the
    * lambda must capture a plain attribute, not an expression tree:
    * HOFs are interpreted and re-evaluate captures per element).
    * Offsets 1..len−n+1, empty array below n chars — spelled as an
    * explicit IF because Spark's `sequence(1, 0)` DESCENDS ([1, 0])
    * where the oracle's `generate_series(1, 0)` is empty. */
  private[graft] def charGramsOf(colName: String, n: Int): Column =
    expr(s"IF(length($colName) >= $n, " +
      s"transform(sequence(1, length($colName) - ${n - 1}), " +
      s"i -> substring($colName, i, $n)), " +
      s"CAST(array() AS ARRAY<STRING>))")

  /** Train a multiclass hashed char-ngram Naive Bayes model — the
    * TRAINED language ID replacing [[TextOps.langId]]'s stopword
    * heuristic for signals word lists cannot see (orthography: accents,
    * scripts — exactly what distinguishes languages sharing a
    * vocabulary). One counting pass, one-vs-all over a shared count
    * table:
    *
    *   w(label, b) = ln(c_{label,b}+1) − ln(C_label + B)
    *   prior(label) = ln(n_label + 1)
    *
    * Every ln argument is a positive integer (the bit-portable
    * integer-ln series), so train AND score replay verbatim in the
    * DuckDB oracle (q194) — the q136 binary-NB discipline generalized
    * to C classes.
    *
    * Scale: one char-gram explode → (label, bucket) partial-agg
    * shuffle (≤ C·B rows), class totals and doc counts are
    * class-cardinality-sized. Returns the DENSE model table
    * (label, bucket, w, prior) — B rows per class, the broadcastable
    * model. */
  def nbMulticlassModel(labeled: DataFrame, textCol: String,
                        labelCol: String, n: Int = 3,
                        buckets: Int = 1024): DataFrame = {
    require(n >= 1, s"gram size must be >= 1, got $n")
    // collapse to per-(label, DISTINCT gram) counts BEFORE hashing:
    // char-gram streams are massively repetitive (natural-language
    // trigram vocabularies are bounded far below the corpus), so the
    // md5 runs per distinct gram instead of per occurrence — measured
    // the dominant cost of the q194 x100 leg. Bucket counts, and
    // therefore the model, are bit-identical.
    val base = labeled.select(col(labelCol).as("label"),
      col(textCol).as("__t"))
    val cnt0 = base
      .select(col("label"), explode(charGramsOf("__t", n)).as("__g"))
      .groupBy("label", "__g").agg(count(lit(1)).as("__gc"))
    nbModelFromLabelGrams(cnt0, base.select("label"), buckets)
  }

  /** Per-document distinct-gram counts — the ONE gram explode a
    * train-then-score pipeline should pay (q194/q195 run the trainer
    * on one split and the scorer on another of the SAME corpus; built
    * separately each leg re-explodes its slice). Cache the result
    * (CachedFrames) and feed the slices to
    * [[nbMulticlassModelFromGrams]] / [[nbClassifyFromGrams]] — both
    * are bit-identical to the direct entry points (integer counts
    * re-aggregate exactly). `extraCols` carries split/label columns
    * through. Returns (idCol, extraCols…, __g, __gc). */
  def nbDocGramCounts(docs: DataFrame, idCol: String, extraCols: Seq[String],
                      textCol: String, n: Int = 3): DataFrame =
    Tables.spread(docs, idCol)
      .select(col(idCol) +: extraCols.map(col) :+ col(textCol).as("__t"): _*)
      .select(col(idCol) +: extraCols.map(col) :+
        explode(charGramsOf("__t", n)).as("__g"): _*)
      .groupBy(col(idCol) +: extraCols.map(col) :+ col("__g"): _*)
      .agg(count(lit(1)).as("__gc"))

  /** [[nbMulticlassModel]] from a [[nbDocGramCounts]] slice. `grams`
    * must carry (labelCol, __g, __gc); `docsForPrior` supplies ONE row
    * per training document with `labelCol` (gram-less documents count
    * toward the prior but emit no gram rows, so the prior cannot be
    * derived from `grams`). */
  def nbMulticlassModelFromGrams(grams: DataFrame, labelCol: String,
                                 docsForPrior: DataFrame,
                                 buckets: Int = 1024): DataFrame =
    nbModelFromLabelGrams(
      grams.select(col(labelCol).as("label"), col("__g"), col("__gc"))
        .groupBy("label", "__g").agg(sum(col("__gc")).as("__gc")),
      docsForPrior.select(col(labelCol).as("label")), buckets)

  /** Shared model tail: (label, distinct gram, count) → dense
    * (label, bucket, w, prior) table. */
  private def nbModelFromLabelGrams(cnt0: DataFrame, priorRows: DataFrame,
                                    buckets: Int): DataFrame = {
    import graft.functions.PortableSketches.lnOfInt
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = cnt0.sparkSession
    val cnt = cnt0
      .select(col("label"), tokenBucket(col("__g"), buckets).as("bucket"),
        col("__gc"))
      .groupBy("label", "bucket").agg(sum(col("__gc")).as("__c"))
    val tot = cnt.groupBy("label").agg(sum(col("__c")).as("__ct"))
    // truncated so the label-count guard reads materialized blocks and
    // the model join below does NOT re-run the corpus aggregate (the
    // eager-probe-recompute trap); the frame is class-cardinality-sized
    val ndoc = Checkpointing.truncate(
      priorRows.groupBy("label").agg(count(lit(1)).as("__nd")))
    require(ndoc.count() >= 2,
      "multiclass training needs at least two labels")
    val grid = tot.select("label")
      .crossJoin(spark.range(buckets.toLong).select(col("id").as("bucket")))
    grid
      .join(cnt, Seq("label", "bucket"), "left")
      .join(tot, Seq("label"))
      .join(ndoc, Seq("label"))
      .select(col("label"), col("bucket"),
        (lnOfInt(coalesce(col("__c"), lit(0L)) + lit(1L))
          - lnOfInt(col("__ct") + lit(buckets.toLong))).as("w"),
        lnOfInt(col("__nd") + lit(1L)).as("prior"))
  }

  /** Classify documents under a [[nbMulticlassModel]]: per class,
    * `prior + Σ_grams w(class, bucket(gram))` (exact DECIMAL(38,12)
    * sum, rendered to double once); predicted class = max score, ties
    * to the LARGEST label (the struct-max total order — the oracle's
    * `ORDER BY score DESC, label DESC` twin). Docs with fewer than n
    * characters emit no row (no grams — the [[dsirWeights]] contract).
    *
    * Scale: the gram stream first collapses to the per-doc BUCKET
    * HISTOGRAM (≤ min(grams, B) rows per doc — one map-side-combined
    * keyed exchange), and only the histogram joins the broadcast
    * C·B-row model; the per-class sum is `Σ cnt · w` in exact DECIMAL
    * (decimal × integer — bit-identical to summing w cnt times, so
    * the scores are unchanged from the per-gram formulation the
    * oracle replays). Without the pre-aggregation the model join
    * multiplied the raw gram stream by C before any reduction —
    * measured 1.5× on the q194 x100 leg. Returns (idCol, pred,
    * score). */
  /** Loud enforcement of [[nbClassify]]'s DECIMAL(7,0) count envelope:
    * a pathological document contributing ≥ 10^7 occurrences of one
    * gram bucket must fail with an error NAMING the document, not
    * overflow the decimal cast into a null / opaque ANSI error. The
    * guard lives in the VALUE path (otherwise-branch of the count
    * itself) so the optimizer cannot prune it. */
  private[graft] def nbCntGuard(cnt: Column, id: Column): Column =
    when(cnt < lit(10000000L), cnt)
      .otherwise(raise_error(concat(
        lit("nbClassify: a document has >= 10^7 occurrences of one gram "
          + "bucket (doc id "),
        id.cast("string"),
        lit(") — past the DECIMAL(7,0) score envelope"))).cast("long"))

  def nbClassify(docs: DataFrame, idCol: String, textCol: String,
                 model: DataFrame, n: Int = 3,
                 buckets: Int = 1024): DataFrame =
    // distinct-gram collapse BEFORE the hash (the trainer's md5
    // economy applied per doc), then the bucket histogram
    nbClassifyFromGrams(nbDocGramCounts(docs, idCol, Nil, textCol, n),
      idCol, model, buckets)

  /** [[nbClassify]] from a [[nbDocGramCounts]] slice — the score leg of
    * the one-explode pipeline. `grams` must carry (idCol, __g, __gc). */
  def nbClassifyFromGrams(grams: DataFrame, idCol: String,
                          model: DataFrame,
                          buckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    grams
      .select(col(idCol), tokenBucket(col("__g"), buckets).as("bucket"),
        col("__gc"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__gc")).as("__cnt"))
      .withColumn("__cnt", nbCntGuard(col("__cnt"), col(idCol)))
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol), col("label"))
      // DECIMAL(30,12) × DECIMAL(7,0) → DECIMAL(38,12) with NO scale
      // reduction (38,12 × int would overflow precision and round):
      // the product is exactly cnt repeated additions of the
      // 12-dec-rounded w, so scores equal the per-gram sum bit for
      // bit. cnt < 10^7 (a ≥10 M-gram single doc would overflow —
      // far past any real document).
      .agg(sum(col("w").cast(DecimalType(30, 12)) *
          col("__cnt").cast(DecimalType(7, 0))).as("__sw"),
        min(col("prior")).as("__p"))
      .select(col(idCol), col("label"),
        (col("__sw").cast("double") + col("__p")).as("score"))
      .groupBy(col(idCol))
      .agg(max(struct(col("score"), col("label"))).as("__b"))
      .select(col(idCol), col("__b").getField("label").as("pred"),
        col("__b").getField("score").as("score"))
  }

  /** DuckDB twin of [[nbMulticlassModel]] + [[nbClassify]] as one
    * reusable CTE chain (the q190 `sketchSql` convention — a single
    * parameterized builder so the q194/q195 oracles cannot drift from
    * each other or from the Spark arithmetic). `srcCte` must provide
    * `(doc_id, lang, t)`; `trainWhere`/`scoreWhere` are predicates
    * over `doc_id`. Emits CTEs ending in `best(doc_id, pred, rn)` —
    * consume with `WHERE rn = 1`. */
  def nbTrainScoreSql(srcCte: String, trainWhere: String,
                      scoreWhere: String, n: Int = 3,
                      buckets: Int = 1024): String = {
    import graft.functions.PortableSketches.lnOfIntSql
    val scoreFilter = if (scoreWhere.isEmpty) "" else s"WHERE $scoreWhere"
    s"""gb AS (
       |  SELECT doc_id, lang,
       |         ('0x' || substr(md5(g), 1, 8))::BIGINT % $buckets AS bucket
       |  FROM (
       |    SELECT doc_id, lang, substr(t, i, $n) AS g
       |    FROM (SELECT doc_id, lang, t,
       |                 unnest(generate_series(1,
       |                   greatest(len(t) - ${n - 1}, 0))) AS i
       |          FROM $srcCte))
       |), tr AS (SELECT * FROM gb WHERE $trainWhere),
       |cnt AS (
       |  SELECT lang AS label, bucket, CAST(count(*) AS BIGINT) AS c
       |  FROM tr GROUP BY 1, 2
       |), tot AS (SELECT label, CAST(sum(c) AS BIGINT) AS ct FROM cnt GROUP BY 1),
       |nd AS (
       |  SELECT lang AS label, CAST(count(*) AS BIGINT) AS ndoc
       |  FROM $srcCte WHERE $trainWhere GROUP BY 1
       |), grid AS (
       |  SELECT label, i AS bucket
       |  FROM tot, (SELECT unnest(generate_series(0, ${buckets - 1})) AS i)
       |), model AS (
       |  SELECT g.label, g.bucket,
       |         ${lnOfIntSql("(COALESCE(c.c, 0) + 1)")}
       |           - ${lnOfIntSql(s"(t2.ct + $buckets)")} AS w,
       |         ${lnOfIntSql("(nd.ndoc + 1)")} AS prior
       |  FROM grid g
       |  LEFT JOIN cnt c ON c.label = g.label AND c.bucket = g.bucket
       |  JOIN tot t2 ON t2.label = g.label
       |  JOIN nd ON nd.label = g.label
       |), hist AS (
       |  SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
       |  FROM gb $scoreFilter GROUP BY 1, 2
       |), sc AS (
       |  SELECT hist.doc_id, m.label,
       |         CAST(sum(CAST(m.w AS DECIMAL(30,12)) *
       |                  CAST(hist.cnt AS DECIMAL(7,0))) AS DOUBLE)
       |           + min(m.prior) AS score
       |  FROM hist JOIN model m ON m.bucket = hist.bucket
       |  GROUP BY 1, 2
       |), best AS (
       |  SELECT doc_id, label AS pred,
       |         row_number() OVER (PARTITION BY doc_id
       |           ORDER BY score DESC, label DESC) AS rn
       |  FROM sc
       |)""".stripMargin
  }

  /** Positional postings — the inverted-index row stream (term, id,
    * pos), 1-based token positions on the whitespace tokenization.
    * This is the index a phrase/proximity search engine builds once
    * and a 100 TB corpus pays for exactly one explode; downstream
    * consumers filter it by term BEFORE any exchange, so only the
    * queried terms' postings ever shuffle. */
  def positionalPostings(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol).as("__id"),
        posexplode(split(col(textCol), " ")).as(Seq("__p0", "term")))
      .select(col("term"), col("__id").as("id"),
        (col("__p0") + 1).cast("long").as("pos"))

  /** Exact phrase search over the positional index: for each phrase,
    * every (doc, occurrence-start) where the phrase's tokens appear
    * CONSECUTIVELY. Output: (phrase, id, n_occ, first_pos) for docs
    * with ≥1 occurrence; overlapping occurrences all count (the
    * token-adjacency definition — NOT the non-overlapping substring
    * replace count, which undercounts self-overlapping phrases).
    *
    * Scale shape: the postings stream is filtered to the union of the
    * phrases' terms first — a tiny literal IN-list pushed to the scan
    * — so the per-word adjacency joins (k−1 of them for a k-word
    * phrase, all keyed on (id, startPos)) move only matching-term
    * postings. No all-token shuffle, no per-doc regex scans over the
    * corpus: term selectivity does the pruning, exactly like a real
    * inverted index probe. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrases: Seq[String]): DataFrame =
    phraseSearchOver(positionalPostings(docs, idCol, textCol), phrases)

  /** Adjacency-join phrase core over any (term, id, pos) postings
    * stream — shared by the inline path and the persisted-index probe. */
  private def phraseSearchOver(postingsAll: DataFrame,
                               phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "at least one phrase")
    val words = phrases.map(_.split(" ").toSeq)
    require(words.forall(_.nonEmpty), "empty phrase")
    val allTerms = words.flatten.distinct
    // the term-filtered postings are matching-rows-sized and feed one
    // consumer per phrase word — cache them (bounded registry) so the
    // corpus explode / index scan runs once, not Σ|phrase| times
    val postings = CachedFrames.cached(
      postingsAll.where(col("term").isInCollection(allTerms)))
    val perPhrase = phrases.zip(words).map { case (phrase, ws) =>
      val starts = ws.zipWithIndex
        .map { case (w, i) =>
          postings.where(col("term") === w)
            .select(col("id"), (col("pos") - i).as("__start"))
        }
        .reduce((a, b) => a.join(b, Seq("id", "__start")))
      starts.groupBy(col("id"))
        .agg(count(lit(1)).as("n_occ"), min("__start").as("first_pos"))
        .select(lit(phrase).as("phrase"), col("id"), col("n_occ"),
          col("first_pos"))
    }
    perPhrase.reduce(_ unionAll _)
  }

  /** Persist the positional postings as a bucketed, term-sorted index
    * table — the build-once half of a real inverted index: the corpus
    * pays its one explode at write time, and every later probe scans
    * only the term-pruned slice (bucket files are term-sorted, so the
    * pushed equality filters skip row groups; the documents table is
    * never touched again — plan-asserted in the spec). */
  def writePostingsIndex(docs: DataFrame, idCol: String, textCol: String,
                         tableName: String, numBuckets: Int = 32,
                         statsTable: Option[String] = None): Unit = {
    Bucketing.writeBucketedBy(positionalPostings(docs, idCol, textCol),
      tableName, numBuckets, Seq("term"), Seq("term"))
    // doc lengths derive from the JUST-WRITTEN index (re-read, not
    // re-tokenized — the signature-index discipline): ranked retrieval
    // needs (id, dl) without a full index scan at probe time
    statsTable.foreach { st =>
      Bucketing.writeBucketedBy(
        docs.sparkSession.table(tableName).groupBy(col("id"))
          .agg(count(lit(1)).as("dl")),
        st, numBuckets, Seq("id"), Seq("id"))
    }
  }

  /** Absorb a new crawl into the postings index without re-reading the
    * archive — ids must be unique across crawls (the cross-corpus
    * contract); appended rows hash into the same term buckets so
    * probes keep their pruned shape over old + new. */
  def appendToPostingsIndex(newDocs: DataFrame, idCol: String,
                            textCol: String, tableName: String,
                            numBuckets: Int = 32,
                            statsTable: Option[String] = None): Unit = {
    val p = CachedFrames.cached(positionalPostings(newDocs, idCol, textCol))
    Bucketing.appendBucketedBy(p, tableName, numBuckets,
      Seq("term"), Seq("term"))
    statsTable.foreach { st =>
      Bucketing.appendBucketedBy(
        p.groupBy(col("id")).agg(count(lit(1)).as("dl")),
        st, numBuckets, Seq("id"), Seq("id"))
    }
  }

  /** [[phraseSearch]] answered from a [[writePostingsIndex]] table. */
  def phraseSearchFromIndex(spark: org.apache.spark.sql.SparkSession,
                            tableName: String,
                            phrases: Seq[String]): DataFrame =
    phraseSearchOver(spark.table(tableName), phrases)

  /** BM25 ranked retrieval answered from a persisted postings index +
    * its (id, dl) stats table — one index, both probe types (phrase
    * adjacency and ranked keyword), which is the point of paying for
    * the build once.
    *
    * Shape: tf = the term-pruned index slice counted per (doc, term);
    * df and the corpus stats are tiny aggregates (term-count and
    * one-row) that broadcast; dl joins per MATCHED doc only. The
    * per-doc score sums its term contributions through DECIMAL(38,12)
    * — order-free, so ranking is stable under any partitioning and
    * (with `logIdf = false`, rational idf) bit-identical cross-engine.
    * Tokenization is the index's raw space-split: scoring semantics
    * live at index-build time, as in any real search engine. */
  def bm25FromIndex(spark: org.apache.spark.sql.SparkSession,
                    postingsTable: String, statsTable: String,
                    terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
                    logIdf: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    import org.apache.spark.sql.types.DecimalType
    val tf = spark.table(postingsTable)
      .where(col("term").isInCollection(terms))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfT = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("__df"))
    val stats = spark.table(statsTable)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("dl")).cast("double").as("__sumdl"))
    val dl = spark.table(statsTable)
      .select(col("id"), col("dl").cast("double").as("__dl"))
    val odds = (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))
    val idf = if (logIdf) log(lit(1.0) + odds) else odds
    val contrib = idf * (col("__tf") * (lit(k1) + lit(1.0)) /
      (col("__tf") + lit(k1) * ((lit(1.0) - lit(b)) +
        lit(b) * (col("__dl") / (col("__sumdl") / col("__n"))))))
    tf.join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .join(dl, "id")
      .select(col("id"), contrib.as("__c"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms_matched"),
        sum(col("__c").cast(DecimalType(38, 12))).cast("double").as("score"))
  }

  /** Escape a string for interpolation into a single-quoted SQL
    * literal (an apostrophe in a phrase/term would otherwise emit a
    * malformed oracle — the one artifact the gate trusts). */
  private[graft] def sqlLit(s: String): String = s.replace("'", "''")

  /** DuckDB twin of [[phraseSearch]] (same adjacency-join definition;
    * `table`/`id`/`text` name the corpus relation and columns). */
  def phraseSearchSql(tableName: String, idCol: String, textCol: String,
                      phrases: Seq[String]): String = {
    val blocks = phrases.map { phrase =>
      val ws = phrase.split(" ").toSeq
      val joins = ws.zipWithIndex.map { case (w, i) =>
        val alias = s"s$i"
        val sel = s"(SELECT doc_id, pos - $i AS start FROM p WHERE term = '${sqlLit(w)}') $alias"
        if (i == 0) s"FROM $sel"
        else s"JOIN $sel ON $alias.doc_id = s0.doc_id AND $alias.start = s0.start"
      }.mkString("\n  ")
      s"""SELECT '${sqlLit(phrase)}' AS phrase, s0.doc_id AS id,
         |  CAST(count(*) AS BIGINT) AS n_occ,
         |  CAST(min(s0.start) AS BIGINT) AS first_pos
         |  $joins
         |GROUP BY 1, 2""".stripMargin
    }
    s"""WITH t AS (SELECT $idCol AS doc_id, string_split($textCol, ' ') AS w
       |           FROM $tableName),
       |p AS (SELECT doc_id, unnest(w) AS term,
       |             generate_subscripts(w, 1) AS pos FROM t)
       |${blocks.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Per-document TF-IDF keyword extraction: each document's top-`k`
    * terms by `tf · (ln N − ln df)` — the summarization/tagging
    * primitive behind corpus topic reports and weak keyword labels.
    *
    * Portability: idf is the DIFFERENCE of two portable integer-ln
    * series terms ([[graft.functions.PortableSketches]]) of exact
    * counts — never libm, never a ratio inside the ln — and the score
    * is one IEEE multiply of an exact long tf against it, so the score
    * column itself is ORDER BY-able cross-engine; ranks tiebreak
    * (score desc, term asc) into a total order.
    *
    * Scale: corpus → (doc, term, tf) in one map-side-combined
    * exchange; df + the 1-row N are vocab-/unit-sized aggregates the
    * optimizer broadcasts back; the top-k rank is a per-doc window
    * over the doc's own distinct terms. No global sort anywhere.
    */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import graft.functions.PortableSketches.lnOfIntFast
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    val tf = docs
      .select(col(idCol).as("id"), explode(toks).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy("id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(df, Seq("term")).crossJoin(n)
      .select(col("id"), col("term"), col("tf"), col("df"),
        (col("tf").cast("double") *
          (lnOfIntFast(col("__n")) - lnOfIntFast(col("df"))))
          .as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Mirror of [[tfidfKeywords]] for the DuckDB oracle. `docsSql` must
    * select `id, text`. */
  def tfidfKeywordsSql(docsSql: String, k: Int): String = {
    import graft.functions.PortableSketches.lnOfIntSql
    s"""WITH t AS (
       |  SELECT id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM ($docsSql)
       |), tok AS (SELECT id, unnest(w) AS term FROM t),
       |tf AS (
       |  SELECT id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM tok GROUP BY 1, 2
       |), idf AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
       |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
       |scored AS (
       |  SELECT tf.id, tf.term, tf.tf, idf.df,
       |         CAST(tf.tf AS DOUBLE) *
       |           (${lnOfIntSql("nn.n")} - ${lnOfIntSql("idf.df")})
       |           AS score
       |  FROM tf JOIN idf ON idf.term = tf.term, nn
       |)
       |SELECT id, term, tf, df, score,
       |       CAST(row_number() OVER (PARTITION BY id
       |         ORDER BY score DESC, term ASC) AS BIGINT) AS rank
       |FROM scored
       |QUALIFY rank <= $k""".stripMargin
  }
}
