package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic table profiling — the audit a pipeline runs BEFORE ingesting
  * a corpus: per column, row/null/distinct counts and the modal value.
  * Complements the numeric profilers (q96 histogram, q97 exact
  * moments/correlation) with the categorical/sanity view.
  */
object Profile {

  /** Per-column summary rows:
    * (col_name, n_rows, n_nulls, n_distinct, top_value, top_count) —
    * n_distinct counts non-null values; top is the most frequent
    * non-null value, ties to the lexicographically smaller stringform.
    *
    * Scale design: ONE pass, ONE shuffle. Every profiled expression is
    * stringified row-locally into (col_name, value) pairs (a k-way
    * melt inside the scan's codegen stage); the (col_name, value)
    * count table collapses map-side before its single exchange, and
    * every statistic derives from that count table — the per-column
    * aggregate then moves one row per DISTINCT value, never per row.
    * Profiling k columns of a 100 TB table costs one scan + a
    * distinct-values-sized shuffle, not k jobs. */
  def summary(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val pairs = df
      .select(explode(array(cols.map { case (n, c) =>
        struct(lit(n).as("col_name"), c.cast("string").as("value"))
      }: _*)).as("__p"))
      .select(col("__p.col_name").as("col_name"), col("__p.value").as("value"))
    val counts = pairs.groupBy("col_name", "value").agg(count(lit(1)).as("__cnt"))
    counts.groupBy("col_name")
      .agg(
        sum("__cnt").as("n_rows"),
        coalesce(sum(when(col("value").isNull, col("__cnt"))), lit(0L)).as("n_nulls"),
        count(when(col("value").isNotNull, lit(1))).as("n_distinct"),
        // max count, ties to the smaller value: min over (-cnt, value)
        min(when(col("value").isNotNull,
          struct((-col("__cnt")).as("nc"), col("value").as("v")))).as("__top"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
        col("__top.v").as("top_value"),
        (-col("__top.nc")).as("top_count"))
  }

  /** Plain-column convenience form (named differently — an overload
    * would erase to the same signature as the (name, Column) one). */
  def summaryOf(df: DataFrame, colNames: String*): DataFrame =
    summary(df, colNames.map(n => n -> col(n)))

  /** EXACT grouped quantiles WITHOUT a global sort — the length/token
    * percentiles every corpus report quotes (p50/p90/p99 doc length
    * per language/source), computed the way a 100 TB table allows:
    * never sort the corpus, never sample.
    *
    * Type-1 (discontinuous) quantile: for percent p, the smallest
    * value whose cumulative count reaches ceil(n·p/100) within its
    * group. All rank arithmetic is INTEGER-only ((n·p + 99) div 100),
    * so the result is bit-portable across engines — no double
    * rounding class — which is also why `valueCol` must be integral
    * (the contract is enforced; doc lengths, token counts, and byte
    * sizes all are).
    *
    * Scale design: the corpus collapses to a per-(group, value) count
    * table FIRST (one map-side-combined exchange keyed by group+value
    * — the only corpus-sized shuffle). The running-count window then
    * operates on the DISTINCT-VALUE table partitioned BY GROUP, so
    * there is no single-partition exchange anywhere and the window
    * state is value-domain-sized, not corpus-sized (doc lengths have
    * ~10⁴ distinct values at any corpus size). The percent list rides
    * along as an exploded literal array (|percents|× the count table,
    * still domain-sized). Sorting 100 TB to learn p99 is the classic
    * anti-pattern; counting to it is one aggregation.
    *
    * Returns (groupCol, pct, value, n_values), one row per group ×
    * requested percent. */
  def exactQuantilesBy(df: DataFrame, groupCol: String, valueCol: String,
                       percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty, "at least one percent")
    require(percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1,100], got $percents")
    require(percents.distinct.size == percents.size,
      s"duplicate percents: $percents")
    val ok = Set("ByteType", "ShortType", "IntegerType", "LongType")
    require(ok.contains(df.schema(valueCol).dataType.toString),
      s"$valueCol must be integral for exact rank arithmetic, got " +
        df.schema(valueCol).dataType)
    import org.apache.spark.sql.expressions.Window
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cum = counts
      .withColumn("__cum",
        sum("__c").over(Window.partitionBy(groupCol).orderBy(col("__v"))))
      .withColumn("__n", sum("__c").over(Window.partitionBy(groupCol)))
    cum
      .select(col(groupCol), col("__v"), col("__cum"), col("__n"),
        explode(array(percents.map(p => lit(p)): _*)).as("pct"))
      .where(col("__cum") >= expr("(__n * pct + 99) div 100"))
      .groupBy(col(groupCol), col("pct"))
      .agg(min("__v").as("value"), min("__n").as("n_values"))
  }

  /** Robust per-group outlier profile — median/MAD fences, the
    * monitoring rule that survives the outliers it is hunting (mean/
    * stddev fences move WITH the anomaly; the breakdown point of the
    * median is 50%).
    *
    * All rank arithmetic runs in CENT-QUANTIZED integer space
    * (`floor(value·100)`: IEEE multiply + floor are bit-identical on
    * any engine — no round-half convention, no double-sum class), via
    * the same counting CDF as [[exactQuantilesBy]]: two count-table
    * aggregations (values, then absolute deviations), each
    * domain-sized, never a corpus sort. The median/MAD table is
    * group-cardinality-sized and broadcasts back onto the row stream;
    * the fence `|v − med| > k·MAD` is integer row-local compare.
    *
    * Returns one row per group: (groupCol, n, med_cents, mad_cents,
    * n_outliers, out_min_cents, out_max_cents) — the outlier extremes
    * are NULL for fully-inlying groups. A zero MAD (≥50% of the group
    * at one value) flags every other value, the documented
    * median-fence degeneracy; callers wanting slack add it to k. */
  def robustOutliersBy(df: DataFrame, groupCol: String, valueCol: String,
                       k: Int = 3): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    // cents feeds the value CDF, the deviation stream, and (via dev)
    // the fence — cached so the corpus scans once (dev itself is a
    // broadcast join over this cache, cheap to recompute twice)
    val cents = CachedFrames.cached(df.where(col(valueCol).isNotNull)
      .select(col(groupCol),
        floor(col(valueCol) * 100).cast("long").as("__vc")))
    val med = exactQuantilesBy(cents, groupCol, "__vc", Seq(50))
      .select(col(groupCol), col("value").as("__med"),
        col("n_values").as("__n"))
    val dev = cents.join(broadcast(med), groupCol)
      .withColumn("__dev", abs(col("__vc") - col("__med")))
    val mad = exactQuantilesBy(dev, groupCol, "__dev", Seq(50))
      .select(col(groupCol), col("value").as("__mad"))
    val fenced = dev.join(broadcast(mad), groupCol)
      .where(col("__dev") > lit(k) * col("__mad"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n_out"), min("__vc").as("__omin"),
        max("__vc").as("__omax"))
    med.join(broadcast(mad), groupCol)
      .join(fenced, Seq(groupCol), "left")
      .select(col(groupCol), col("__n").as("n"),
        col("__med").as("med_cents"), col("__mad").as("mad_cents"),
        coalesce(col("__n_out"), lit(0L)).as("n_outliers"),
        col("__omin").as("out_min_cents"),
        col("__omax").as("out_max_cents"))
  }

  /** Per-group winsorization audit — clip values to the group's
    * [pLow, pHigh] exact percentiles (the value-clamping pass a
    * tabular training pipeline runs so one fat-finger row cannot own
    * the gradient) and report what moved.
    *
    * Same portability frame as [[robustOutliersBy]]: cent-floored
    * integer space, fences from the counting CDF ([[exactQuantilesBy]]
    * — domain-sized, no corpus sort), clamp = integer
    * greatest/least, means as exact DECIMAL(38,0) cent sums rendered
    * through the string route. Returns (groupCol, n, lo_cents,
    * hi_cents, n_clipped_lo, n_clipped_hi, mean_cents,
    * mean_winsorized_cents). */
  def winsorizeBy(df: DataFrame, groupCol: String, valueCol: String,
                  pLow: Int, pHigh: Int): DataFrame = {
    require(1 <= pLow && pLow < pHigh && pHigh <= 100,
      s"need 1 <= pLow < pHigh <= 100, got ($pLow, $pHigh)")
    import org.apache.spark.sql.types.DecimalType
    val cents = CachedFrames.cached(df.where(col(valueCol).isNotNull)
      .select(col(groupCol),
        floor(col(valueCol) * 100).cast("long").as("__vc")))
    val fences = exactQuantilesBy(cents, groupCol, "__vc", Seq(pLow, pHigh))
      .groupBy(col(groupCol))
      .agg(min(when(col("pct") === pLow, col("value"))).as("__lo"),
        min(when(col("pct") === pHigh, col("value"))).as("__hi"))
    def meanCents(c: Column): Column =
      sum(c.cast(DecimalType(38, 0))).cast("string").cast("double") /
        count(lit(1))
    cents.join(broadcast(fences), groupCol)
      .withColumn("__w", greatest(col("__lo"), least(col("__hi"), col("__vc"))))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        min("__lo").as("lo_cents"), min("__hi").as("hi_cents"),
        sum((col("__vc") < col("__lo")).cast("long")).as("n_clipped_lo"),
        sum((col("__vc") > col("__hi")).cast("long")).as("n_clipped_hi"),
        meanCents(col("__vc")).as("mean_cents"),
        meanCents(col("__w")).as("mean_winsorized_cents"))
  }

  /** Key-distribution (skew) profile — the diagnosis a planner wants
    * BEFORE it shuffles 100 TB on a key: per candidate key column,
    * cardinality, the hottest key's share (the salting trigger),
    * Shannon entropy in nats (effective cardinality = e^H), and the
    * Gini coefficient of the count distribution (0 = perfectly
    * uniform, →1 = one key owns the table).
    *
    * One melt pass + one (col, value)-keyed count aggregation — the
    * [[summary]] shape — then everything derives from aggregates of
    * the count table. The Gini rank sum does NOT rank values
    * individually (a row_number over a unique key's count table is a
    * corpus-sized single-partition sort — the q144 anti-pattern; the
    * in-round review caught the first draft doing exactly that):
    * equal counts contribute a CLOSED-FORM run sum, so the rank
    * window runs over the (column, count, multiplicity) table — one
    * row per DISTINCT COUNT VALUE (a unique key collapses to one row
    * m = D) — with Σ i·cᵢ for a run of m equal counts starting at
    * rank r being c·(m·r + m·(m−1)/2), exact in longs up to ~3·10⁹
    * ranks per column and then summed in DECIMAL(38,0).
    * Portability: both sums are term-exact (the run terms above;
    * cᵢ·ln cᵢ with the integer-domain [[graft.functions.PortableLn]]
    * series in DECIMAL(18,6)) and rendered through the string-route;
    * the remaining arithmetic is row-local IEEE. */
  def keyDistribution(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "profile at least one key column")
    import graft.functions.PortableSketches.lnOfIntFast
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val pairs = df
      .select(explode(array(keys.map(k =>
        struct(lit(k).as("col_name"), col(k).cast("string").as("__val"))): _*))
        .as("kv"))
      .select(col("kv.col_name").as("col_name"), col("kv.__val").as("__val"))
      .where(col("__val").isNotNull)
    val counts = pairs.groupBy("col_name", "__val")
      .agg(count(lit(1)).as("__ct"))
    // (column, count) multiplicity table: one row per distinct COUNT
    // value — the window below is count-domain-sized, never
    // value-domain- (let alone corpus-) sized
    val runs = counts.groupBy("col_name", "__ct")
      .agg(count(lit(1)).as("__m"))
      .withColumn("__cumm", sum("__m").over(
        Window.partitionBy("col_name").orderBy(col("__ct"))))
      .withColumn("__rstart", col("__cumm") - col("__m") + 1)
    def strDouble(c: Column): Column = c.cast("string").cast("double")
    val runRanks = col("__m") * col("__rstart") +
      expr("(__m * (__m - 1)) div 2")
    runs.groupBy("col_name")
      .agg(sum(col("__ct") * col("__m")).cast("long").as("n"),
        sum("__m").as("n_distinct"),
        max("__ct").as("top_count"),
        strDouble(sum(col("__ct").cast(DecimalType(38, 0)) * runRanks))
          .as("__s1"),
        strDouble(sum((col("__ct") * lnOfIntFast(col("__ct")) * col("__m"))
          .cast(DecimalType(38, 6)))).as("__slnc"))
      .select(col("col_name"), col("n"), col("n_distinct"), col("top_count"),
        (col("top_count").cast("double") / col("n")).as("top_share"),
        (lnOfIntFast(col("n")) - col("__slnc") / col("n")).as("entropy_nats"),
        (lit(2.0) * col("__s1") /
          (col("n_distinct").cast("double") * col("n").cast("double")) -
          (col("n_distinct") + 1).cast("double") / col("n_distinct"))
          .as("gini"))
  }

  /** Data-quality expectations audit — the Great-Expectations-style
    * gate a pipeline runs before promoting a table: each rule is
    * `(name, measured aggregate, pass aggregate)`, and ALL rules
    * evaluate in ONE aggregation pass over the frame (a k-rule audit
    * must not cost k corpus scans — the single 1-row aggregate is
    * exploded into rule rows afterwards).
    *
    * Measures are cast to double for a uniform report column; exact
    * integer measures (counts, orphan tallies) stay exact in double
    * far past any table's row count, so the report hashes
    * cross-engine. Returns `(rule, value, pass)`.
    */
  def auditExpectations(df: DataFrame,
                        rules: Seq[(String, Column, Column)]): DataFrame = {
    require(rules.nonEmpty, "auditExpectations needs at least one rule")
    val cols = rules.zipWithIndex.flatMap { case ((_, m, p), i) =>
      Seq(m.cast("double").as(s"__m$i"), p.as(s"__p$i"))
    }
    df.agg(cols.head, cols.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case ((n, _, _), i) =>
        struct(lit(n).as("rule"), col(s"__m$i").as("value"),
          col(s"__p$i").as("pass"))
      }: _*)).as("__r"))
      .select(col("__r.rule").as("rule"), col("__r.value").as("value"),
        col("__r.pass").as("pass"))
  }
}
