package graft

import org.apache.spark.sql.functions._

import graft.functions.HdrQuantile
import graft.ops.{Incremental, QuantileSketch, Tables}

/** The portable HDR quantile sketch: exact-arithmetic register
  * encoding, monotonicity, decode bounds, the merge-equals-whole
  * monoid law, the guaranteed relative error bound vs an exact sorted
  * CDF, and the state-table maintenance composition. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val S = HdrQuantile.DefaultS

  /** Independent ARITHMETIC derivation of the bucket id (binary-search
    * exponent over exact scalb compares + exact in-octave scaling) —
    * no IEEE bit access, mirroring what the SQL twin does. The
    * differential target for the production bit-pattern derivation. */
  private def bucketOfArith(v: Double, s: Int): Long = {
    if (java.lang.Double.isNaN(v)) return HdrQuantile.overflowId(s)
    if (v == 0.0) return 0L
    val a = math.abs(v)
    val pid =
      if (a < java.lang.Math.scalb(1.0, HdrQuantile.MinExp)) 1L
      else if (a >= java.lang.Math.scalb(1.0, HdrQuantile.MaxExp))
        HdrQuantile.overflowId(s)
      else {
        // binary-search e with exact power-of-two comparisons
        var lo = HdrQuantile.MinExp
        var hi = HdrQuantile.MaxExp - 1
        while (lo < hi) {
          val mid = (lo + hi + 1) / 2
          if (a >= java.lang.Math.scalb(1.0, mid)) lo = mid else hi = mid - 1
        }
        val e = lo
        // a / 2^e exact; f - 1 exact (Sterbenz, f in [1,2)); * 2^s exact
        val f = java.lang.Math.scalb(a, -e)
        val sub = math.floor((f - 1.0) * (1L << s).toDouble).toLong
        ((e + 62).toLong << s) + sub + 2L
      }
    if (v > 0) pid else -pid
  }

  private def edgeCases: Seq[Double] = {
    val powers = Seq(-62, -61, -10, -1, 0, 1, 10, 61, 62).map(k =>
      java.lang.Math.scalb(1.0, k))
    val around = powers.flatMap(p =>
      Seq(p, Math.nextUp(p), Math.nextDown(p), -p))
    around ++ Seq(0.0, -0.0, Double.MinPositiveValue,
      -Double.MinPositiveValue, 1e-300, -1e-300, 1e300, -1e300,
      Double.PositiveInfinity, Double.NegativeInfinity,
      1.0, 1.5, -1.5, math.Pi, -math.E, 0.1, -0.1, 3.0, 1e18)
  }

  test("bucket id: bit-pattern derivation equals the arithmetic derivation") {
    val rnd = new scala.util.Random(42)
    val randoms = Seq.fill(20000) {
      // spread over many octaves incl. negatives
      val e = rnd.nextInt(130) - 65
      val m = 1.0 + rnd.nextDouble()
      val sign = if (rnd.nextBoolean()) 1.0 else -1.0
      sign * java.lang.Math.scalb(m, e)
    }
    for (v <- edgeCases ++ randoms) {
      assert(HdrQuantile.bucketOf(v, S) == bucketOfArith(v, S),
        s"derivations diverge at v=$v (${java.lang.Double.toHexString(v)})")
    }
    assert(HdrQuantile.bucketOf(Double.NaN, S) == HdrQuantile.overflowId(S))
  }

  test("bucket id is monotone in v; decode brackets the value") {
    val rnd = new scala.util.Random(7)
    val vs = (Seq.fill(5000)(
      (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(12) - 6))
      ++ edgeCases.filterNot(_.isInfinity)).sorted
    vs.sliding(2).foreach {
      case Seq(a, b) =>
        assert(HdrQuantile.bucketOf(a, S) <= HdrQuantile.bucketOf(b, S),
          s"monotonicity broken between $a and $b")
      case _ =>
    }
    // normal-range positives: decode(id) <= v < decode(id + 1)
    for (v <- vs if v >= java.lang.Math.scalb(1.0, HdrQuantile.MinExp) &&
                   v < java.lang.Math.scalb(1.0, HdrQuantile.MaxExp)) {
      val id = HdrQuantile.bucketOf(v, S)
      val lo = HdrQuantile.decodeLower(id, S)
      val hi = HdrQuantile.decodeLower(id + 1, S)
      assert(lo <= v && v < hi, s"bucket [$lo,$hi) does not bracket $v")
      // bucket width is the error bound: (hi-lo)/lo <= 2^-s
      assert((hi - lo) / lo <= math.pow(2, -S) + 1e-15)
    }
  }

  test("merge of epoch sketches equals the from-scratch sketch, any order") {
    val li = Tables.table(spark, sf, "lineitem")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val whole = QuantileSketch.sketch(li, "l_returnflag", rev, S)
      .orderBy("l_returnflag", "bucket").collect().toSeq
    val epochs = (0 to 2).map(m =>
      QuantileSketch.sketch(li.where(expr(s"l_orderkey % 3 = $m")),
        "l_returnflag", rev, S))
    for (perm <- Seq(epochs, epochs.reverse,
        Seq(epochs(1), epochs(2), epochs(0)))) {
      val merged = QuantileSketch.merge(perm, "l_returnflag")
        .orderBy("l_returnflag", "bucket").collect().toSeq
      assert(merged == whole, "monoid law: merged registers must equal whole")
    }
  }

  test("quantile estimates carry the guaranteed < 2^-s relative error vs the exact CDF") {
    val li = Tables.table(spark, sf, "lineitem")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val percents = Seq(1, 10, 25, 50, 75, 90, 99, 100)
    val est = QuantileSketch.quantilesOf(li, "l_returnflag", rev, percents, S)
      .select("l_returnflag", "pct", "value")
      .as[(String, Int, Double)].collect()
      .map { case (g, p, v) => (g, p) -> v }.toMap
    // exact quantiles by in-memory sort with the same ceil(n*p/100) rank
    val byGroup = li.select(col("l_returnflag"), rev.as("v"))
      .as[(String, Double)].collect().groupBy(_._1)
    for ((g, rows) <- byGroup; p <- percents) {
      val sorted = rows.map(_._2).sorted
      val rank = ((sorted.length.toLong * p + 99) / 100).toInt
      val exact = sorted(rank - 1)
      val e = est((g, p))
      assert(e <= exact, s"estimate must be the bucket lower edge: $e > $exact")
      assert((exact - e) / exact <= math.pow(2, -S) + 1e-15,
        s"relative error bound broken at ($g, p$p): est=$e exact=$exact")
    }
  }

  test("state-table maintenance: advanced register state answers whole-corpus quantiles") {
    val st = "qsketch_spec_state"
    Tables.dropTablesAndDirs(spark, st, s"${st}__next", s"${st}__old")
    val li = Tables.table(spark, sf, "lineitem")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    QuantileSketch.sketch(li.where(expr("l_orderkey % 4 = 0")),
        "l_returnflag", rev, S)
      .write.saveAsTable(st)
    for (m <- 1 to 3)
      Incremental.advanceStateTableBy(spark, st,
        QuantileSketch.sketch(li.where(expr(s"l_orderkey % 4 = $m")),
          "l_returnflag", rev, S),
        Seq("l_returnflag", "bucket"), QuantileSketch.mergeAggs)
    val fromState = QuantileSketch.quantiles(
        spark.table(st), "l_returnflag", Seq(50, 95), S)
      .orderBy("l_returnflag", "pct").collect().toSeq
    val fromWhole = QuantileSketch.quantilesOf(
        li, "l_returnflag", rev, Seq(50, 95), S)
      .orderBy("l_returnflag", "pct").collect().toSeq
    assert(fromState == fromWhole)
    Tables.dropTablesAndDirs(spark, st)
  }

  test("sketch plan: one map-side-combined exchange, registers only") {
    val li = Tables.table(spark, sf, "lineitem")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val state = QuantileSketch.sketch(li, "l_returnflag", rev, S)
    val plan = state.queryExecution.executedPlan.toString
    // partial aggregate below the single exchange (map-side combine)
    assert(plan.contains("HashAggregate"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one exchange:\n$plan")
    // register table is tiny: few groups x few occupied octaves
    assert(state.count() < 2000)
  }

  test("bounded sketch: budget enforced, counts preserved, huge budget = plain sketch") {
    val li = Tables.table(spark, sf, "lineitem")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val src = li.select(col("l_returnflag"), rev.as("__v"))
    val plain = QuantileSketch.sketch(src, "l_returnflag", col("__v"), S)
    // a budget no group exceeds → k = 0 everywhere, registers identical
    val loose = QuantileSketch.sketchBounded(src, "l_returnflag", col("__v"),
      S, maxRegisters = 1000000)
    assert(loose.select("s_eff").distinct().as[Int].collect().toSeq == Seq(S))
    assert(loose.select("l_returnflag", "bucket", "cnt")
      .exceptAll(plain).isEmpty &&
      plain.exceptAll(loose.select("l_returnflag", "bucket", "cnt")).isEmpty)
    // a tight budget collapses; per-group register count obeys it and
    // the total count per group is untouched (no rows lost in merging)
    val tight = QuantileSketch.sketchBounded(src, "l_returnflag", col("__v"),
      S, maxRegisters = 16).cache()
    val regCounts = tight.groupBy("l_returnflag")
      .agg(count(lit(1)).as("nr"), min("s_eff").as("se"))
      .as[(String, Long, Int)].collect()
    assert(regCounts.forall { case (_, nr, se) => nr <= 16 && se < S },
      s"budget not enforced: ${regCounts.toSeq}")
    val totTight = tight.groupBy("l_returnflag").agg(sum("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val totPlain = plain.groupBy("l_returnflag").agg(sum("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(totTight == totPlain, "collapse must preserve counts exactly")
    tight.unpersist()
    ()
  }

  test("bounded sketch: error bound 2^-s_eff holds; merge equals from-scratch, any order") {
    val li = Tables.table(spark, sf, "lineitem")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val src = li.select(col("l_returnflag"), rev.as("__v"))
    val state = QuantileSketch.sketchBounded(src, "l_returnflag", col("__v"),
      S, maxRegisters = 16).cache()
    val percents = Seq(1, 25, 50, 90, 100)
    val est = QuantileSketch.quantilesBounded(state, "l_returnflag", percents)
      .select("l_returnflag", "pct", "value", "s_eff")
      .as[(String, Int, Double, Int)].collect()
      .map { case (g, p, v, se) => (g, p) -> ((v, se)) }.toMap
    val byGroup = src.as[(String, Double)].collect().groupBy(_._1)
    for ((g, rows) <- byGroup; p <- percents) {
      val sorted = rows.map(_._2).sorted
      val rank = ((sorted.length.toLong * p + 99) / 100).toInt
      val exact = sorted(rank - 1)
      val (e, se) = est((g, p))
      assert(e <= exact, s"lower edge above exact at ($g, p$p): $e > $exact")
      assert((exact - e) / exact <= math.pow(2, -se) + 1e-15,
        s"2^-s_eff bound broken at ($g, p$p, s_eff=$se): est=$e exact=$exact")
    }
    // merge law: epoch bounded states re-merge to the from-scratch
    // sketch coarsened to the same resolution, in any order
    val epochs = (0 to 2).map(m =>
      QuantileSketch.sketchBounded(
        src.where(expr(s"pmod(hash(__v), 3) = $m")),
        "l_returnflag", col("__v"), S, maxRegisters = 16))
    // the merge law, order-free: merging the epoch states with a
    // ZERO-count copy of the from-scratch state (and vice versa)
    // coarsens both sides to the same minimum resolution without
    // changing either side's counts — at that aligned resolution the
    // register tables must be IDENTICAL (same support, same counts)
    def zeroed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("l_returnflag"), col("s_eff"), col("bucket"),
        (col("cnt") * 0).as("cnt"))
    for (perm <- Seq(epochs, epochs.reverse,
        Seq(epochs(2), epochs(0), epochs(1)))) {
      val merged = QuantileSketch.mergeBounded(perm, "l_returnflag")
      val mAligned = QuantileSketch.mergeBounded(
        Seq(merged, zeroed(state)), "l_returnflag")
      val wAligned = QuantileSketch.mergeBounded(
        Seq(state, zeroed(merged)), "l_returnflag")
      assert(mAligned.exceptAll(wAligned).isEmpty &&
        wAligned.exceptAll(mAligned).isEmpty,
        "merged epochs must equal the from-scratch state at aligned resolution")
    }
    state.unpersist()
    ()
  }

  test("negative/mixed domain: magnitude bound holds both signs; negative decode is the upper value edge") {
    // signed values: profit-and-loss shape, both signs per group, plus
    // exact zeros (the resolution-free special register)
    val li = Tables.table(spark, sf, "lineitem")
    val pnl = col("l_extendedprice") * (col("l_discount") - lit(0.05))
    val src = li.select(col("l_returnflag"), pnl.as("__v"))
    val percents = Seq(1, 10, 50, 90, 100)
    val est = QuantileSketch.quantilesOf(src, "l_returnflag", col("__v"),
        percents, S)
      .select("l_returnflag", "pct", "value")
      .as[(String, Int, Double)].collect()
      .map { case (g, p, v) => (g, p) -> v }.toMap
    val byGroup = src.as[(String, Double)].collect().groupBy(_._1)
    var sawAbove = false
    for ((g, rows) <- byGroup; p <- percents) {
      val sorted = rows.map(_._2).sorted
      val rank = ((sorted.length.toLong * p + 99) / 100).toInt
      val exact = sorted(rank - 1)
      val e = est((g, p))
      // sidedness: the decode is the lower MAGNITUDE edge, so for a
      // negative exact quantile the estimate may sit ABOVE it — the
      // one-sided e <= exact contract is non-negative-domain only
      if (e > exact) sawAbove = true
      if (exact != 0.0)
        assert(math.abs(exact - e) / math.abs(exact) <=
            math.pow(2, -S) + 1e-15,
          s"magnitude bound broken at ($g, p$p): est=$e exact=$exact")
      else assert(e == 0.0, s"zero register must decode to 0, got $e")
      // signs never flip: the register id carries the value's sign
      assert(e == 0.0 || exact == 0.0 || (e > 0) == (exact > 0),
        s"sign flipped at ($g, p$p): est=$e exact=$exact")
    }
    assert(sawAbove,
      "fixture must exercise a negative quantile (estimate above exact) " +
        "or the sidedness caveat is untested")
  }
}
