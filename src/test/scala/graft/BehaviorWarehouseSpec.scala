package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{Behavior, TextOps, TimeSeries, Warehouse}

/** Hand-computed fixtures for the behavioral/warehouse family
  * (q163-q169): funnel cascade strictness, retention-cohort
  * invariants, SCD2 tick/compression/interval semantics, point-in-time
  * matching, trailing RANGE windows, PMI collocations, and mojibake
  * repair. */
class BehaviorWarehouseSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L

  test("funnel: min-ts cascade counts strictly ordered chains only") {
    // u1 full chain; u2 stops at view; u3 signup after a stray view,
    // then view/click; u4 purchase only (never enters); u5 click
    // BEFORE its view (not counted); u6 view at the SAME instant as
    // signup (strict > excludes it).
    val ev = Seq(
      (1L, 1L, "signup"), (1L, 2L, "view"), (1L, 3L, "click"), (1L, 4L, "purchase"),
      (2L, 1L, "signup"), (2L, 2L, "view"),
      (3L, 1L, "view"), (3L, 2L, "signup"), (3L, 5L, "view"), (3L, 6L, "click"),
      (4L, 1L, "purchase"),
      (5L, 3L, "signup"), (5L, 2L, "click"), (5L, 4L, "view"),
      (6L, 1L, "signup"), (6L, 1L, "view")
    ).toDF("u", "t", "typ")
    val out = Behavior.funnel(ev, "u", col("t"), "typ",
        Seq("signup", "view", "click", "purchase"))
      .orderBy("step_idx").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1, "signup", 5L), (2, "view", 4L), (3, "click", 2L),
        (4, "purchase", 1L)))
    assert(out(0).getDouble(3) === 1.0)           // pct_of_first step 1
    assert(out(0).isNullAt(4))                    // no previous step
    assert(out(2).getDouble(3) === 2.0 / 5.0)
    assert(out(2).getDouble(4) === 2.0 / 4.0)
  }

  test("funnel: empty upstream step yields zero rows downstream, null ratios") {
    val ev = Seq((1L, 1L, "view")).toDF("u", "t", "typ")
    val out = Behavior.funnel(ev, "u", col("t"), "typ",
        Seq("signup", "view")).orderBy("step_idx").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 0L))
    assert(out(0).isNullAt(3) && out(1).isNullAt(3)) // 0/0 cohort → null
  }

  test("retentionCohorts: offset 0 equals cohort size; gaps stay absent") {
    val ev = Seq(
      (1L, 0L), (1L, 1L * 86400L + 5L), (1L, 3L * 86400L + 9L),
      (2L, 10L),
      (3L, 86400L), (3L, 2L * 86400L)
    ).toDF("u", "t").select(col("u"), timestamp_seconds(col("t")).as("ts"))
    val out = Behavior.retentionCohorts(ev, "u", col("ts"))
      .orderBy("cohort_day", "day_offset").collect()
    // cohort day0: {u1,u2} offsets 0,1,3; cohort day1: {u3} offsets 0,1
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((0L, 2L, 2L), (1L, 1L, 2L), (3L, 1L, 2L),
        (0L, 1L, 1L), (1L, 1L, 1L)))
    out.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) === r.getLong(3)) // offset-0 invariant
    }
    assert(out(1).getDouble(4) === 0.5)
  }

  test("scd2Build: tick-final wins, heartbeats compress, revert reopens") {
    val ch = Seq(
      ("k1", 1L * H, 1L, "A"), ("k1", 1L * H, 2L, "B"), // tick-final → B
      ("k1", 2L * H, 3L, "B"),                          // heartbeat
      ("k1", 3L * H, 4L, "A"),                          // revert → v2
      ("k2", 5L * H, 9L, "Z")
    ).toDF("k", "t", "seq", "state")
      .select(col("k"), timestamp_seconds(col("t")).as("ts"),
        col("seq"), col("state"))
    val out = Warehouse.scd2Build(ch, "k", col("ts"), "seq", Seq("state"))
      .orderBy("k", "version").collect()
    assert(out.length === 3)
    val k1 = out.filter(_.getString(0) == "k1")
    assert(k1.map(r => (r.getString(1), r.getLong(5))).toSeq ===
      Seq(("B", 1L), ("A", 2L)))
    assert(k1(0).getTimestamp(3) === k1(1).getTimestamp(2)) // half-open chain
    assert(!k1(0).getBoolean(4) && k1(1).getBoolean(4))     // is_current
    assert(k1(1).isNullAt(3))                               // open interval
    assert(out.filter(_.getString(0) == "k2").head.getBoolean(4))
  }

  test("scd2Apply: incremental advance equals the full rebuild, splice tick included") {
    import graft.ops.Warehouse.{scd2Apply, scd2Build}
    // base feed: k1 A@1h then B@2h; tail: C lands ON the current tick
    // (2h, higher seq — must win tick-final over the replayed point)
    // then a C heartbeat at 3h (must compress); k2 untouched; k3 born
    // in the tail.
    val all = Seq(
      ("k1", 1L * H, 1L, "A"), ("k1", 2L * H, 2L, "B"),
      ("k1", 2L * H, 3L, "C"), ("k1", 3L * H, 4L, "C"),
      ("k2", 1L * H, 1L, "Z"),
      ("k3", 5L * H, 9L, "Y")
    ).toDF("k", "t", "seq", "state")
      .select(col("k"), timestamp_seconds(col("t")).as("ts"),
        col("seq"), col("state"))
    val base = all.where(col("seq") <= 2)
    val tail = all.where(col("seq") > 2)
    val dim = scd2Build(base, "k", col("ts"), "seq", Seq("state"))
    val inc = scd2Apply(dim, tail, "k", col("ts"), "seq", Seq("state"))
      .orderBy("k", "version").collect().map(_.toSeq)
    val full = scd2Build(all, "k", col("ts"), "seq", Seq("state"))
      .orderBy("k", "version").collect().map(_.toSeq)
    assert(inc.toSeq === full.toSeq)
    // and the splice semantics concretely: k1 = A[1h,2h), C[2h,∞)
    val k1 = inc.filter(_.head == "k1")
    assert(k1.map(r => (r(1), r(5))).toSeq === Seq(("A", 1L), ("C", 2L)))
  }

  test("pointInTime: facts match covering version; early/unknown keys stay null") {
    val ch = Seq(
      ("k1", 1L * H, 1L, "B"), ("k1", 3L * H, 2L, "A")
    ).toDF("k", "t", "seq", "state")
      .select(col("k"), timestamp_seconds(col("t")).as("ts"),
        col("seq"), col("state"))
    val dim = Warehouse.scd2Build(ch, "k", col("ts"), "seq", Seq("state"))
    val facts = Seq(
      (1L, "k1", H / 2),      // before first version → null
      (2L, "k1", H + H / 2),  // inside [1h, 3h) → B
      (3L, "k1", 3L * H),     // boundary: valid_from inclusive → A
      (4L, "k9", 2L * H)      // unknown key → null
    ).toDF("fid", "k", "t")
      .select(col("fid"), col("k"), timestamp_seconds(col("t")).as("fts"))
    val out = Warehouse.pointInTime(facts, "k", col("fts"), dim, "k",
        Seq("state"))
      .orderBy("fid").collect()
    def st(r: Row) = if (r.isNullAt(r.fieldIndex("state"))) null
                     else r.getAs[String]("state")
    assert(out.map(st).toSeq === Seq(null, "B", "A", null))
    assert(out.length === 4) // disjoint intervals: no fan-out
  }

  test("rollingRange: trailing time window with instant ties as peers") {
    val ev = Seq(
      (1L, 0L, 100L), (1L, 1800L, 200L), (1L, 3660L, 400L),
      (1L, 3660L, 800L), // tie: frame peer of the row above
      (2L, 0L, 50L)
    ).toDF("u", "t", "cents")
      .select(col("u"), timestamp_seconds(col("t")).as("ts"), col("cents"))
    val out = TimeSeries.rollingRange(ev, "u", col("ts"), col("cents"),
        windowMicros = 3600L * 1000000L)
      .orderBy("u", "epoch_us", "cents")
      .select("u", "trail_n", "trail_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // t=3660 frame is [60, 3660]: drops t=0, keeps 200+400+800 (peers)
    assert(out.toSeq === Seq(
      (1L, 1L, 100L), (1L, 2L, 300L), (1L, 3L, 1400L), (1L, 3L, 1400L),
      (2L, 1L, 50L)))
  }

  test("collocationsPmi: counts and the portable ln tree match by hand") {
    import graft.functions.PortableSketches.lnOfPosLong
    val docs = Seq("a b a b", "a b c").toDF("text")
    // pairs: (a,b)=3, (b,a)=1, (b,c)=1; uni a=3 b=3 c=1; M=7, N=5;
    // minCount=2 floors out the hapax pairs
    val out = TextOps.collocationsPmi(docs, "text", minCount = 2L, k = 10)
      .collect()
    assert(out.length === 1)
    val top = out.head
    assert((top.getString(0), top.getString(1), top.getLong(2)) ===
      ("a", "b", 3L))
    val expected = lnOfPosLong(3) + 2.0 * lnOfPosLong(7) -
      lnOfPosLong(5) - lnOfPosLong(3) - lnOfPosLong(3)
    assert(top.getDouble(3) === expected)
    // with the floor off, the full pair set survives and stays a
    // total order under the (pmi desc, w1, w2) tiebreak
    assert(TextOps.collocationsPmi(docs, "text", 1L, 10).count() === 3)
  }

  test("applyChangelog: last change wins, deletes drop, inserts add, untouched keep") {
    val base = Seq(("k1", "a", 10L), ("k2", "b", 20L), ("k3", "c", 30L))
      .toDF("k", "name", "cents")
    val changes = Seq(
      ("k2", 1L, "U", "b2", 21L), ("k2", 2L, "U", "b3", 22L), // last wins
      ("k3", 5L, "D", "x", 0L),                               // delete base
      ("k4", 9L, "I", "d", 40L),                              // insert new
      ("k5", 1L, "I", "e", 50L), ("k5", 2L, "D", "x", 0L)     // born+died
    ).toDF("k", "seq", "op", "name", "cents")
    val out = graft.ops.Warehouse.applyChangelog(base, changes, "k",
        "seq", "op", Seq("name", "cents"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("k1", "a", 10L), ("k2", "b3", 22L), ("k4", "d", 40L)))
  }

  test("session funnel: a chain crossing a session boundary does not count") {
    val ev = Seq(
      (1L, 0L, "signup"), (1L, 100L, "view"),   // same session: counts
      (2L, 0L, "signup"), (2L, 5000L, "view")   // gap > 1000s: new session
    ).toDF("u", "t", "typ")
      .select(col("u"), timestamp_seconds(col("t")).as("ts"), col("typ"))
    val tagged = Behavior.withSessionIds(ev, "u", col("ts"), 1000L)
      .withColumn("skey", concat(col("u"), lit("#"), col("session_id")))
    val inSession = Behavior.funnel(tagged, "skey", col("ts"), "typ",
        Seq("signup", "view"))
      .orderBy("step_idx").collect().map(_.getLong(2))
    assert(inSession.toSeq === Seq(2L, 1L)) // u2's view is out-of-session
    val plain = Behavior.funnel(ev, "u", col("ts"), "typ",
        Seq("signup", "view"))
      .orderBy("step_idx").collect().map(_.getLong(2))
    assert(plain.toSeq === Seq(2L, 2L)) // the plain funnel counts it
  }

  test("funnelLatency: exact CDF picks over known step latencies") {
    val ev = Seq(
      (1L, 0L, "signup"), (1L, 10L, "view"),
      (2L, 0L, "signup"), (2L, 30L, "view"),
      (3L, 0L, "signup") // stalls: absent from the pair's distribution
    ).toDF("u", "t", "typ")
      .select(col("u"), timestamp_seconds(col("t")).as("ts"), col("typ"))
    val out = Behavior.funnelLatency(ev, "u", col("ts"), "typ",
        Seq("signup", "view"), percents = Seq(50, 100))
      .orderBy("pct").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("1:signup->view", 50, 10000000L, 2L),
      ("1:signup->view", 100, 30000000L, 2L)))
  }

  test("CDC fold: seq-ordered waves equal the batch merge; out-of-order genuinely diverges") {
    import graft.ops.Warehouse.applyChangelog
    val base = Seq(("k1", "a", 1L)).toDF("k", "name", "cents")
    val all = Seq(("k1", 3L, "D", "x", 0L), ("k1", 5L, "U", "b", 2L))
      .toDF("k", "seq", "op", "name", "cents")
    def apply1(b: org.apache.spark.sql.DataFrame,
               c: org.apache.spark.sql.DataFrame) =
      applyChangelog(b, c, "k", "seq", "op", Seq("name", "cents"))
    val batch = apply1(base, all).collect()
    // in-order waves (seq ranges): delete then re-insert → equals batch
    val ordered = apply1(apply1(base, all.where(col("seq") === 3)),
      all.where(col("seq") === 5)).collect()
    assert(batch.map(_.toSeq).toSeq === ordered.map(_.toSeq).toSeq)
    assert(batch.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("k1", "b")))
    // out-of-order waves (the contract q177 documents): the stale
    // delete lands LAST and kills the newer upsert — divergence is
    // real, which is why the waves must respect per-key seq order
    val shuffled = apply1(apply1(base, all.where(col("seq") === 5)),
      all.where(col("seq") === 3)).collect()
    assert(shuffled.isEmpty)
  }

  test("abTest: hand z-squared, significance, and degenerate arms") {
    // A: 4 users 3 conv, B: 4 users 0 conv → z² = 0.5625/0.1171875 = 4.8
    val e1 = (1 to 4).map(i => ("e1", "A", i <= 3)) ++
      (1 to 4).map(_ => ("e1", "B", false))
    // everyone converts → pooled variance 0 → null z², not significant
    val e2 = Seq(("e2", "A", true), ("e2", "B", true))
    // one-arm experiment → null z², null rate_b
    val e3 = Seq(("e3", "A", true))
    val df = (e1 ++ e2 ++ e3).toDF("exp", "variant", "conv")
    val out = Behavior.abTest(df, "exp", "variant", "conv")
      .orderBy("exp").collect()
    assert(out(0).getDouble(7) === 4.8)
    assert(out(0).getBoolean(8))
    assert(out(1).isNullAt(7) && !out(1).getBoolean(8))
    assert(out(2).isNullAt(7) && out(2).isNullAt(6) && !out(2).getBoolean(8))
  }

  test("sessionize: gap splits, tie rows share a session, aggregates exact") {
    val ev = Seq(
      (1L, 0L, 10L), (1L, 0L, 20L),      // tied first instant: one session
      (1L, 100L, 30L),                   // within gap
      (1L, 2000L, 40L),                  // gap > 1000s: new session
      (2L, 5L, 7L)
    ).toDF("u", "t", "c")
      .select(col("u"), timestamp_seconds(col("t")).as("ts"), col("c"))
    val out = Behavior.sessionize(ev, "u", col("ts"), col("c"),
        gapSeconds = 1000L)
      .orderBy("u", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq === Seq(
      (1L, 1L, 0L, 100000000L, 100000000L, 3L, 60L),
      (1L, 2L, 2000000000L, 2000000000L, 0L, 1L, 40L),
      (2L, 1L, 5000000L, 5000000L, 0L, 1L, 7L)))
  }

  test("eventTransitions: lag pairs, seq breaks ties, probabilities exact") {
    val ev = Seq(
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"),
      (1L, 3L, 3L, "A"), (1L, 4L, 4L, "B"),
      (2L, 1L, 5L, "A"), (2L, 1L, 6L, "C") // tied ts: seq orders A→C
    ).toDF("u", "t", "seq", "typ")
    val out = Behavior.eventTransitions(ev, "u", col("t"), "typ", "seq")
      .orderBy("src", "dst").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("A", "B", 2L, 2.0 / 3.0), ("A", "C", 1L, 1.0 / 3.0),
      ("B", "A", 1L, 1.0)))
  }

  test("rollingAnomaly: k-sigma spike flagged, flat window and minN not") {
    val ev = (0 until 5).map(i => (1L, i * 60L, 100L)) :+ (1L, 330L, 1000L)
    val df = ev.toDF("u", "t", "c")
      .select(col("u"), timestamp_seconds(col("t")).as("ts"), col("c"))
    val out = TimeSeries.rollingAnomaly(df, "u", col("ts"), col("c"),
        windowMicros = 3600L * 1000000L, k = 2, minN = 5L)
      .orderBy("epoch_us").select("trail_n", "is_anomaly").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    // spike: n=6, S=1500, SS=1050000 → lhs 4500² = 20.25e6 >
    // rhs 4·(6·1050000 − 1500²) = 16.2e6
    assert(out.toSeq === Seq((1L, false), (2L, false), (3L, false),
      (4L, false), (5L, false), (6L, true)))
  }

  test("fleschReadingEase: hand counts, sentence floor, empty-text null") {
    val df = Seq("aa bb. cc", "no punctuation here", "").toDF("text")
    val out = df.select(col("text") +:
        graft.ops.TextOps.fleschReadingEase(col("text")): _*)
      .collect()
    val r0 = out.find(_.getString(0) == "aa bb. cc").get
    assert((r0.getLong(1), r0.getLong(2), r0.getLong(3)) === ((3L, 1L, 1L)))
    assert(r0.getDouble(4) ===
      206.835 - 1.015 * (3.0 / 1.0) - 84.6 * (1.0 / 3.0))
    val r1 = out.find(_.getString(0) == "no punctuation here").get
    assert(r1.getLong(2) === 1L) // sentence floor
    val r2 = out.find(_.getString(0) == "").get
    assert(r2.getLong(1) === 0L && r2.isNullAt(4)) // null, never NaN
  }

  test("auditExpectations: one pass, failing and passing rules report honestly") {
    val df = Seq((1L, -5.0), (1L, 2.0), (2L, 3.0)).toDF("id", "v")
    val out = graft.ops.Profile.auditExpectations(df, Seq(
        ("id_unique", count(col("id")) - countDistinct(col("id")),
          count(col("id")) - countDistinct(col("id")) === 0),
        ("rows_present", count(lit(1)), count(lit(1)) > 0),
        ("v_positive", min(col("v")), min(col("v")) > 0.0)))
      .orderBy("rule").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(out.toSeq === Seq(
      ("id_unique", 1.0, false), ("rows_present", 3.0, true),
      ("v_positive", -5.0, false)))
  }

  test("rfmSegments: clean quartile fixture end to end") {
    // user i: i events, last at day 6+i, 10 cents each →
    // r_days 4-i, f = i, m = 10i; thresholds r {0,1,2}, f/m {1,2,3}
    val ev = (1 to 4).flatMap { i =>
      (1 to i).map(j => (i.toLong, (6L + i) * 86400L - j * 3600L, 10L))
    }.toDF("u", "t", "c")
      .select(col("u"), timestamp_seconds(col("t")).as("ts"), col("c"))
    val out = Behavior.rfmSegments(ev, "u", col("ts"), col("c"))
      .orderBy("u").collect()
      .map(r => (r.getLong(0), r.getAs[String]("segment")))
    assert(out.toSeq === Seq(
      (1L, "411"), (2L, "322"), (3L, "233"), (4L, "144")))
  }

  test("basketPairs: apriori prune, exact support/confidence/lift") {
    val baskets = Seq(
      ("b1", "A"), ("b1", "B"), ("b1", "C"),
      ("b2", "A"), ("b2", "B"), ("b2", "B"), // dup item collapses
      ("b3", "A")
    ).toDF("b", "i")
    val out = Behavior.basketPairs(baskets, "b", "i",
        minSupport = 2L, k = 10).collect()
    // C (1 basket) pruned before pairing; (A,B) in b1+b2:
    // support 2/3, confidence 2/3 (n_A=3), lift 2·3/(3·2) = 1.0
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) ===
      ("A", "B", 2L))
    assert(r.getDouble(3) === 2.0 / 3.0)
    assert(r.getDouble(4) === 2.0 / 3.0)
    assert(r.getDouble(5) === 1.0)
  }

  test("eventPaths: trigram counts under the total order") {
    val ev = Seq(
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "A"), (1L, 4L, 4L, "B"),
      (2L, 1L, 5L, "A"), (2L, 2L, 6L, "B"), (2L, 3L, 7L, "A")
    ).toDF("u", "t", "seq", "typ")
    val out = Behavior.eventPaths(ev, "u", col("t"), "typ", "seq", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("A->B->A", 2L), ("B->A->B", 1L)))
  }

  test("seasonalProfile: Spark dow convention, cents sum per cell") {
    // 2024-01-07 is a Sunday → Spark dow 1; 2024-01-08 Monday → 2
    val ev = Seq(
      ("2024-01-07 10:15:00", 100L), ("2024-01-07 10:45:00", 250L),
      ("2024-01-08 23:00:00", 40L)
    ).toDF("s", "c").select(col("s").cast("timestamp").as("ts"), col("c"))
    val out = Behavior.seasonalProfile(ev, col("ts"), col("c"))
      .orderBy("dow", "hod").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1, 10, 2L, 350L), (2, 23, 1L, 40L)))
  }

  test("activeUsersDaily: dau, first-day news, exact cumulative curve") {
    val ev = Seq(
      (1L, 0L), (1L, 86400L), (2L, 10L), (3L, 86410L), (3L, 86420L)
    ).toDF("u", "t").select(col("u"), timestamp_seconds(col("t")).as("ts"))
    val out = Behavior.activeUsersDaily(ev, "u", col("ts"))
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((2L, 2L, 2L), (2L, 1L, 3L)))
  }

  test("tfidfKeywords: hand tf/df/portable-idf scores and rank tiebreak") {
    import graft.functions.PortableSketches.lnOfPosLong
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("id", "text")
    val out = graft.ops.Relevance.tfidfKeywords(docs, "id", "text", k = 2)
      .orderBy("id", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    val ln21 = lnOfPosLong(2) - lnOfPosLong(1)
    val zero = 2.0 * (lnOfPosLong(2) - lnOfPosLong(2))
    assert(out.toSeq === Seq(
      (1L, "b", 1L, 1L, ln21, 1L), (1L, "a", 2L, 2L, zero, 2L),
      (2L, "c", 1L, 1L, ln21, 1L), (2L, "a", 1L, 2L, 0.0, 2L)))
  }

  test("mojibake: detect, repair, and stay idempotent") {
    import TextOps.{MojiAcute, MojiLDQuoteL1, MojiQuoteCp, MojiQuoteL1}
    val df = Seq(
      // both read-as-Latin-1 and read-as-cp1252 flavors in one text
      (s"caf$MojiAcute ${MojiLDQuoteL1}quote$MojiQuoteL1 and$MojiQuoteCp done",
        4L, 0L),
      ("clean text", 0L, 0L),
      ("lost�byte�", 0L, 2L)
    ).toDF("text", "want_moji", "want_fffd")
    val got = df.select(
      TextOps.mojibakeCount(col("text")).cast("long").as("m"),
      TextOps.replacementCharCount(col("text")).cast("long").as("f"),
      TextOps.repairMojibake(col("text")).as("r"),
      TextOps.repairMojibake(TextOps.repairMojibake(col("text"))).as("rr"),
      col("want_moji"), col("want_fffd")).collect()
    got.foreach { r =>
      assert(r.getLong(0) === r.getLong(4))
      assert(r.getLong(1) === r.getLong(5))
      assert(r.getString(2) === r.getString(3)) // idempotent
    }
    assert(got(0).getString(2) === "café “quote’ and’ done")
    // U+FFFD is never invented back
    assert(got(2).getString(2) === "lost�byte�")
  }

  test("survivalCurve: hand-computed Kaplan-Meier with right-censoring") {
    val day = 86400L
    // observation ends at u5's last event (day 30). Lifetimes:
    // u1,u2: churn at T=10; u3: churn at T=10 (offset start); u6:
    // churn at T=20; u4: active 6h before end -> CENSORED at T=30;
    // u5: active at the end -> CENSORED at T=10 (leaves the risk set
    // before the T=20 step — the censoring semantics under test)
    val ev = Seq(
      ("u1", 0L), ("u1", 10 * day),
      ("u2", 0L), ("u2", 10 * day),
      ("u3", 5 * day), ("u3", 15 * day),
      ("u4", 0L), ("u4", 30 * day - 6 * 3600L),
      ("u5", 20 * day), ("u5", 30 * day),
      ("u6", 0L), ("u6", 20 * day)
    ).toDF("u", "sec").select(col("u"), timestamp_seconds(col("sec")).as("ts"))
    val got = graft.ops.Behavior
      .survivalCurve(ev, "u", col("ts"), horizonHours = 12)
      .orderBy("t_days")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // T=10: at risk 6 (everyone has T>=10), churns 3 -> S = 3/6 = 0.5
    // T=20: at risk 2 (u4 T=30, u6 T=20; u5 censored at 10 is GONE),
    //       churns 1 -> S = 0.5 * 1/2 = 0.25
    assert(got == Seq((10L, 6L, 3L, 0.5), (20L, 2L, 1L, 0.25)))
    // dropping censoring would be a different (wrong) curve: every
    // censored user would count as a churn — guard the distinction
    val noCensor = graft.ops.Behavior
      .survivalCurve(ev, "u", col("ts"), horizonHours = 0)
      .orderBy("t_days")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(noCensor != got)
  }

  test("bitemporalAsOf: late-recorded assertions are invisible before their tx time") {
    // key k1: state A valid@10 recorded@10; CORRECTION state B
    // valid@12 recorded@50 (late). k2: plain history. k3: two
    // assertions at the SAME valid instant — seq breaks the tie.
    val ch = Seq(
      ("k1", 10L, 10L, 1L, "A"), ("k1", 12L, 50L, 2L, "B"),
      ("k2", 5L, 5L, 3L, "X"), ("k2", 20L, 21L, 4L, "Y"),
      ("k3", 15L, 16L, 5L, "old"), ("k3", 15L, 17L, 6L, "new")
    ).toDF("k", "vt", "tt", "seq", "state")
    def asOf(vt: Long, tt: Long): Map[String, (Long, String)] =
      graft.ops.Warehouse.bitemporalAsOf(ch, "k", col("vt"), col("tt"),
          col("seq"), Seq("state"), lit(vt), lit(tt))
        .select("k", "vt", "state").as[(String, Long, String)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // at tx=30: k1's correction (recorded@50) must be INVISIBLE
    val early = asOf(vt = 25L, tt = 30L)
    assert(early("k1") == (10L, "A"))
    assert(early("k2") == (20L, "Y"))
    assert(early("k3") == (15L, "new"), "seq must break the same-vt tie")
    // at tx=60: the correction is known — same valid cutoff, new answer
    val late = asOf(vt = 25L, tt = 60L)
    assert(late("k1") == (12L, "B"))
    // valid cutoff below every assertion: no row for that key
    assert(!asOf(vt = 4L, tt = 100L).contains("k2") ||
      asOf(vt = 4L, tt = 100L).isEmpty)
    assert(!asOf(vt = 4L, tt = 100L).contains("k1"))
  }

  test("bitemporalTable: rectangle containment answers every as-of; hand rectangles") {
    val ch = Seq(
      ("k1", 10L, 10L, 1L, "A"), ("k1", 12L, 50L, 2L, "B"),
      ("k2", 5L, 5L, 3L, "X"), ("k2", 20L, 21L, 4L, "Y"),
      ("k3", 15L, 16L, 5L, "old"), ("k3", 15L, 17L, 6L, "new")
    ).toDF("k", "vt", "tt", "seq", "state")
    val rects = graft.ops.Warehouse.bitemporalTable(ch, "k", col("vt"),
      col("tt"), col("seq"), Seq("state")).cache()
    // the k1 story materialized: before the correction the warehouse
    // believed A-open from vt=10 (tx [10, 50)); after, A is clipped
    // at 12 and B is current (tx [50, open))
    val k1 = rects.where(col("k") === "k1")
      .select("state", "valid_from", "valid_to", "tx_from", "tx_to")
      .as[(String, Long, Option[Long], Long, Option[Long])]
      .collect().toSet
    assert(k1 == Set(
      ("A", 10L, None, 10L, Some(50L)),
      ("A", 10L, Some(12L), 50L, None),
      ("B", 12L, None, 50L, None)))
    // containment in the rectangles == the point as-of, on a probe grid
    for (vtQ <- Seq(4L, 11L, 13L, 25L); ttQ <- Seq(9L, 16L, 30L, 60L)) {
      val viaAsOf = graft.ops.Warehouse.bitemporalAsOf(ch, "k", col("vt"),
          col("tt"), col("seq"), Seq("state"), lit(vtQ), lit(ttQ))
        .select("k", "state").as[(String, String)].collect().toSet
      val viaRect = rects.where(
          col("tx_from") <= ttQ &&
            (col("tx_to").isNull || lit(ttQ) < col("tx_to")) &&
          col("valid_from") <= vtQ &&
            (col("valid_to").isNull || lit(vtQ) < col("valid_to")))
        .select("k", "state").as[(String, String)].collect().toSet
      assert(viaRect == viaAsOf,
        s"rectangles and as-of disagree at (vt=$vtQ, tt=$ttQ)")
    }
    rects.unpersist()
    ()
  }

  test("advanceBitemporalTable: incremental equals full; untouched keys' rows survive") {
    import graft.ops.Warehouse
    val all = Seq(
      ("k1", 10L, 10L, 1L, "A"), ("k1", 12L, 50L, 2L, "B"),
      ("k2", 5L, 5L, 3L, "X"), ("k2", 20L, 21L, 4L, "Y"),
      ("k3", 15L, 16L, 5L, "old"), ("k3", 15L, 17L, 6L, "new")
    ).toDF("k", "vt", "tt", "seq", "state")
    val norm = Warehouse.normalizeAssertions(all, "k", col("vt"), col("tt"),
      col("seq"), Seq("state"))
    val rt = "spec_bt_rect"; val at = "spec_bt_assert"
    graft.ops.Tables.dropTablesAndDirs(spark, rt, s"${rt}__next",
      s"${rt}__old", at)
    // base = odd seqs (keeps every key present so k2 is genuinely
    // untouched by the delta below)
    norm.where(col("__seq") % 2 === 1).write.saveAsTable(at)
    Warehouse.bitemporalTable(spark.table(at), "k", col("__vt"),
        col("__tt"), col("__seq"), Seq("state"))
      .write.saveAsTable(rt)
    // delta touches k1 and k3 only
    Warehouse.advanceBitemporalTable(spark, rt, at,
      norm.where(col("__seq") % 2 === 0), "k", Seq("state"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "state", "valid_from", "valid_to", "tx_from", "tx_to", "version")
      .as[(String, String, Long, Option[Long], Long, Option[Long], Int)]
      .collect().toSet
    val incremental = canon(spark.table(rt))
    val full = canon(Warehouse.bitemporalTable(all, "k", col("vt"),
      col("tt"), col("seq"), Seq("state")))
    assert(incremental == full, "incremental advance must equal the full rebuild")
    // the assertion log now holds everything
    assert(spark.table(at).count() == 6)
    // RETRY safety: replaying the SAME advance (the crash-recovery
    // re-run) must be a no-op — the (key, __seq) anti-join keeps the
    // log duplicate-free, so version numbering cannot shift
    Warehouse.advanceBitemporalTable(spark, rt, at,
      norm.where(col("__seq") % 2 === 0), "k", Seq("state"))
    assert(spark.table(at).count() == 6,
      "replayed advance must not double-append the delta")
    assert(canon(spark.table(rt)) == full,
      "replayed advance must leave the rectangle table unchanged")
    graft.ops.Tables.dropTablesAndDirs(spark, rt, at)
  }

  test("advanceBitemporalTable: bootstraps a missing assertion log (ADVICE r12)") {
    import graft.ops.Warehouse
    val all = Seq(("k1", 10L, 10L, 1L, "A"), ("k2", 5L, 6L, 2L, "X"))
      .toDF("k", "vt", "tt", "seq", "state")
    val norm = Warehouse.normalizeAssertions(all, "k", col("vt"), col("tt"),
      col("seq"), Seq("state"))
    val rt = "spec_bt_boot_rect"; val at = "spec_bt_boot_assert"
    graft.ops.Tables.dropTablesAndDirs(spark, rt, s"${rt}__next",
      s"${rt}__old", at)
    // rectangle table pre-exists empty; the assertion log does NOT —
    // a first advance must create it instead of throwing
    Warehouse.bitemporalTable(norm.limit(0), "k", col("__vt"),
        col("__tt"), col("__seq"), Seq("state"))
      .write.saveAsTable(rt)
    Warehouse.advanceBitemporalTable(spark, rt, at, norm, "k", Seq("state"))
    assert(spark.table(at).count() == 2, "bootstrap must create + fill the log")
    val full = Warehouse.bitemporalTable(all, "k", col("vt"), col("tt"),
        col("seq"), Seq("state"))
      .select("k", "state", "version")
      .as[(String, String, Int)].collect().toSet
    val got = spark.table(rt).select("k", "state", "version")
      .as[(String, String, Int)].collect().toSet
    assert(got == full)
    // a replay right after bootstrap must still be idempotent
    Warehouse.advanceBitemporalTable(spark, rt, at, norm, "k", Seq("state"))
    assert(spark.table(at).count() == 2)
    graft.ops.Tables.dropTablesAndDirs(spark, rt, at)
  }

  test("bitemporalTable: a hot key past the assertion cap fails loudly, named") {
    // hot: 12 corrections of one entity; cold keys stay under the cap
    val hot = (1L to 12L).map(i => ("hot", i, i, i, s"s$i"))
    val cold = Seq(("cold", 1L, 1L, 100L, "c"))
    val ch = (hot ++ cold).toDF("k", "vt", "tt", "seq", "state")
    val e = intercept[Exception] {
      graft.ops.Warehouse.bitemporalTable(ch, "k", col("vt"), col("tt"),
        col("seq"), Seq("state"), maxAssertionsPerKey = 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("key hot") &&
        m.contains("maxAssertionsPerKey=10")),
      s"guard must name the hot key: ${msgs(e)}")
    // under the cap nothing changes: same fixture, cap not hit
    val ok = graft.ops.Warehouse.bitemporalTable(ch, "k", col("vt"), col("tt"),
      col("seq"), Seq("state"), maxAssertionsPerKey = 12)
    assert(ok.count() > 0)
  }
}
