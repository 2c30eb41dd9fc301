package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * `df.randomSplit` is seed-dependent on partitioning — re-running after a
  * repartition reassigns rows. These operators derive the assignment from
  * a hash of a stable id, so membership is a pure function of the row:
  * reproducible across runs, partitionings, and engines, and a document
  * can never land in both train and test. No shuffle — the bucket is a
  * per-row expression evaluated inside the scan's codegen stage.
  */
object Sampling {

  private val Buckets = 1000000

  /** Stable bucket in [0, 1) for a row id. */
  def hashFraction(id: Column): Column =
    pmod(xxhash64(id), lit(Buckets)).cast("double") / Buckets

  /** Keep a deterministic `fraction` of rows by id hash. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.where(hashFraction(col(idCol)) < fraction)

  /** 32-hex-digit lower bound covering `fraction` of the md5 space:
    * `md5(x) < hexThreshold(f)` holds for fraction f of uniformly
    * distributed inputs (md5 hex is lowercase in every engine, so the
    * string comparison is portable). Digits come from the base-16
    * expansion of the fraction. */
  private[graft] def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    val digits = "0123456789abcdef"
    val sb = new StringBuilder(32)
    var f = BigDecimal(fraction)
    var i = 0
    while (i < 32) {
      f = f * 16
      val d = math.min(15, f.toInt)
      sb.append(digits(d))
      f -= d
      i += 1
    }
    sb.toString
  }

  /** Disjoint, exhaustive named splits, e.g.
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1). Adds a `split`
    * column; fractions must sum to 1.
    *
    * Membership compares md5 of the id's decimal string form against
    * per-split hex thresholds — a pure per-row function (reproducible
    * across runs, partitionings, and engines) that every engine can
    * recompute verbatim, so split assignment is differentially testable
    * (q70's DuckDB oracle re-derives it from the same SQL). The
    * xxhash64-based [[hashFraction]] stays for the rate samplers where
    * a cheaper hash matters and the exact member set does not. */
  def deterministicSplit(df: DataFrame, idCol: String,
                         splits: Seq[(String, Double)]): DataFrame = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val h = md5(col(idCol).cast("string"))
    val cumulative = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.zip(cumulative).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), hi)) =>
        when(h < lit(hexThreshold(hi)), name).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Per-stratum deterministic sampling: keep `fractions(stratum)` of each
    * stratum (default fraction for unlisted strata). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       default: Double = 0.0): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, v).otherwise(acc)
    }
    df.where(hashFraction(col(idCol)) < frac)
  }

  /** Exact-size deterministic sample per group: the n rows with the
    * smallest md5(id) in each group — "give me exactly 1000 documents
    * per language, stably". Unlike rate-based sampling the output size
    * is exact; membership is still a pure function of the id (re-runs,
    * repartitions, and other engines agree — md5 is everywhere, which
    * is what makes this variant differentially testable).
    *
    * Scale shape: one shuffle on the group key + a rank window; per-task
    * state is the window's sort. For heavily skewed groups the
    * rate-based [[stratifiedSample]] (no shuffle at all) is the
    * bigger-hammer alternative. */
  def fixedSizePerGroup(df: DataFrame, idCol: String, groupCol: String,
                        n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= n)
      .drop("__rank")
  }

  /** Temperature-scaled mixture weights per group — the data-mixing step
    * of corpus prep: a group's target share ∝ n^(1/T), so T = 1 keeps the
    * natural distribution and larger T flattens it toward uniform,
    * up-weighting small (e.g. low-resource-language) groups.
    *
    * Returns one row per group: (groupCol, n_docs, weight, target_frac).
    * The group table is tiny (one row per source/language), so the total
    * is a one-row broadcast — the corpus itself is touched once, by the
    * count.
    *
    * Determinism: weights are n^(1/T) rounded through DECIMAL(18,9), so
    * the normalizing sum is exact and order-independent (a raw double
    * sum would depend on merge order); `T = 2.0` stays bit-reproducible
    * across engines because sqrt is a correctly-rounded IEEE op (general
    * exponents go through libm pow — engine-specific last ulp). */
  def temperatureWeights(df: DataFrame, groupCol: String,
                         temperature: Double = 2.0): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    import org.apache.spark.sql.types.DecimalType
    val n = col("n_docs").cast("double")
    val raw = if (temperature == 2.0) sqrt(n) else pow(n, 1.0 / temperature)
    val w = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("wd", raw.cast(DecimalType(18, 9)))
    val total = w.agg(sum(col("wd")).as("wt"))
    w.crossJoin(broadcast(total))
      .select(col(groupCol), col("n_docs"),
        col("wd").cast("double").as("weight"),
        (col("wd").cast("double") / col("wt").cast("double")).as("target_frac"))
  }

  /** Deterministic temperature resampling: sample each group at the rate
    * that makes the output mixture match [[temperatureWeights]] at
    * `targetTotal` rows overall (rates above 1 are capped — this
    * operator only downsamples). Membership stays a pure per-row hash:
    * the only shuffle is the tiny per-group count.
    *
    * `expectedGroups` is the caller's bound on `groupCol`'s cardinality
    * — it gates the rate-table broadcast HINT through the engine-wide
    * [[Dedup.maybeBroadcast]] limit (never correctness): the default
    * covers the documented source/language-style grouping; a caller
    * grouping by a high-cardinality key passes its own bound and above
    * the conf limit the hint is dropped (Spark plans a shuffle join;
    * AQE still broadcasts at runtime if the table turns out small). */
  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
                        targetTotal: Long,
                        temperature: Double = 2.0,
                        expectedGroups: Long = 100000L): DataFrame = {
    val rates = temperatureWeights(df, groupCol, temperature)
      .select(col(groupCol),
        least(lit(1.0),
          col("target_frac") * targetTotal / col("n_docs").cast("double"))
          .as("__rate"))
    df.join(Dedup.maybeBroadcast(rates, expectedGroups), groupCol)
      .where(hashFraction(col(idCol)) < col("__rate"))
      .drop("__rate")
  }

  /** Reproducible per-epoch shuffle into training shards — the
    * "see the data in a different order every epoch, identically on
    * every re-run" primitive of a training-data reader. Each row's
    * shard and within-shard position are pure functions of
    * (epoch, id): key = md5(epoch || ':' || id), shard = first 32 key
    * bits mod `numShards` (32-bit range makes the mod bias negligible
    * for any practical shard count), position = rank of the key inside
    * the shard (ties to the smaller id — md5 collisions on distinct
    * inputs don't occur, but the tiebreak keeps the contract total). Changing `epoch` re-deals both shard membership and
    * order; re-running an epoch reproduces them bit-for-bit on any
    * partitioning or engine.
    *
    * Scale design: this deliberately does NOT global-sort the corpus.
    * The physical shape is one shuffle keyed by shard (each shard a
    * task) + a within-partition sort — `numShards` should be sized so
    * a shard is one training-reader stream (hundreds to thousands at
    * 100 TB). A global `orderBy(key)` would range-sample and
    * range-exchange the whole corpus for a total order nothing
    * consumes: readers consume SHARDS.
    *
    * Returns the input columns + (shard int, seq bigint — 1-based
    * within shard). */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Long,
                   numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be positive, got $numShards")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(lit(epoch.toString), lit(":"), col(idCol).cast("string")))
    val shard = (conv(substring(key, 1, 8), 16, 10).cast("long") % numShards).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("__key").asc, col(idCol).asc)
    df.withColumn("__key", key)
      .withColumn("shard", shard)
      .withColumn("seq", row_number().over(w).cast("long"))
      .drop("__key")
  }

  /** Greedy per-group budget fill — "spend at most `budget` units
    * (tokens, chars, bytes) per domain on the best documents": within
    * each group, rows are taken in (`orderCol` DESC, id ASC) order and
    * kept while the running sum of `weightCol` stays ≤ `budget`. The
    * first row that would overflow the budget — and everything after
    * it — is dropped (a row whose own weight exceeds the budget is
    * never taken; weights must be non-negative or the running sum is
    * not monotone and the "prefix" reading breaks). This is the
    * data-mixing step after quality scoring:
    * the score decides the order, the budget caps each domain's share
    * of the training run.
    *
    * Returns the input columns + `cum_weight` (running total INCLUDING
    * the row, a bigint — weights must be integral so the prefix sums
    * are exact and order-independent across engines).
    *
    * Scale design: one shuffle keyed by the group + a per-group sort
    * feeding a running-sum window — the same physical shape as
    * [[fixedSizePerGroup]]. Group count is domain-sized (small); the
    * per-task burden is the largest group's sort, so a heavily skewed
    * group set at 100 TB should pre-filter with the rate-based
    * [[stratifiedSample]] (no shuffle) before the exact budget pass. */
  def budgetSelect(df: DataFrame, idCol: String, groupCol: String,
                   orderCol: String, weightCol: String,
                   budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    // Enforce the contract instead of silently breaking it: a
    // fractional weight would be truncated by the long cast, and a
    // negative weight makes the running sum non-monotone (rows after an
    // overflow would re-enter the "prefix"). The type check is
    // plan-time; negativity is guarded row-locally in the plan itself
    // (raise_error at first offender — no extra validation scan).
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val wType = df.schema(weightCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(wType),
      s"weight column '$weightCol' must be integral (exact prefix sums), got $wType")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val guarded = when(col(weightCol) < 0, raise_error(concat(
        lit(s"budgetSelect: negative weight in '$weightCol' for id="),
        col(idCol).cast("string"))))
      .otherwise(col(weightCol).cast("long"))
    df.withColumn("cum_weight", sum(guarded).over(w))
      .where(col("cum_weight") <= budget)
  }
}
