package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.ops.{Incremental, Tables}

/** [[graft.ops.Incremental]] — state-as-data aggregate maintenance. */
class IncrementalSpec extends SparkSpec {

  private val group = Seq("o_orderpriority")

  /** Table + warehouse-dir scrub (the metastore is per-JVM but
    * spark-warehouse persists across forked test runs). */
  private def scrub(tables: String*): Unit =
    Tables.dropTablesAndDirs(spark, tables: _*)

  test("merge of epoch states equals the from-scratch aggregate, any order") {
    val orders = Tables.table(spark, sf, "orders")
    val epochs = Seq(
      orders.where(expr("o_orderkey % 3 = 0")),
      orders.where(expr("o_orderkey % 3 = 1")),
      orders.where(expr("o_orderkey % 3 = 2")))
    val states = epochs.map(e =>
      Incremental.aggState(e, group, "o_totalprice"))
    val direct = Incremental.finish(
      Incremental.aggState(orders, group, "o_totalprice"), group)
      .orderBy("o_orderpriority").collect().toSeq
    for (perm <- Seq(states, states.reverse, Seq(states(1), states(2), states(0)))) {
      val merged = Incremental.finish(
        Incremental.mergeStates(perm, group), group)
        .orderBy("o_orderpriority").collect().toSeq
      assert(merged == direct)
    }
  }

  test("advanceStateTable folds deltas in-place; result tracks from-scratch") {
    val st = "q152spec_state"
    scrub(st, s"${st}__next", s"${st}__old")
    val orders = Tables.table(spark, sf, "orders")
    Incremental.aggState(orders.where(expr("o_orderkey % 4 = 0")),
        group, "o_totalprice")
      .write.mode("overwrite").saveAsTable(st)
    for (m <- 1 to 3)
      Incremental.advanceStateTable(spark, st,
        orders.where(expr(s"o_orderkey % 4 = $m")), group, "o_totalprice")
    val got = Incremental.finish(spark.table(st), group)
      .orderBy("o_orderpriority").collect().toSeq
    val want = Incremental.finish(
        Incremental.aggState(orders, group, "o_totalprice"), group)
      .orderBy("o_orderpriority").collect().toSeq
    assert(got == want)
  }

  test("maintenance plan scans state + delta only — never the base epoch") {
    val st = "q152spec_state2"
    scrub(st)
    val orders = Tables.table(spark, sf, "orders")
    Incremental.aggState(orders.where(expr("o_orderkey % 2 = 0")),
        group, "o_totalprice")
      .write.mode("overwrite").saveAsTable(st)
    // AQE off so the concrete scan nodes are visible to collect
    // (AdaptiveSparkPlanExec hides its children)
    val scans =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        Incremental.mergeStates(Seq(spark.table(st),
            Incremental.aggState(orders.where(expr("o_orderkey % 2 = 1")),
              group, "o_totalprice")), group)
          .queryExecution.executedPlan.collect {
            case f: FileSourceScanExec => f
          }
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(scans.size == 2, s"expected state + delta scans, got $scans")
    val paths = scans.map(_.relation.location.rootPaths.mkString(","))
    assert(paths.exists(_.contains(st)), s"no state-table scan in $paths")
    val deltaScan = scans.find(_.relation.location.rootPaths
      .mkString(",").contains("orders.parquet"))
    assert(deltaScan.exists(_.dataFilters.nonEmpty),
      "delta scan must carry the epoch predicate, not a full rescan")
  }

  test("generic monoid advance: HLL register state, 3-way split equals whole") {
    import graft.functions.PortableSketches._
    import graft.ops.Tables
    val st = "q158spec_state"
    scrub(st, s"${st}__next", s"${st}__old")
    val events = Tables.table(spark, sf, "events")
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), hllDigest(col("user_id")).as("__d"))
      .groupBy(col("event_type"), hllBucket(col("__d")).as("bucket"))
      .agg(max(hllRho(col("__d"))).as("r"))
    regs(events.where(expr("event_id % 3 = 0")))
      .write.mode("overwrite").saveAsTable(st)
    for (m <- 1 to 2)
      graft.ops.Incremental.advanceStateTableBy(spark, st,
        regs(events.where(expr(s"event_id % 3 = $m"))),
        Seq("event_type", "bucket"), Seq(max(col("r")).as("r")))
    val got = spark.table(st).orderBy("event_type", "bucket").collect().toSeq
    val whole = regs(events).orderBy("event_type", "bucket").collect().toSeq
    assert(got == whole, "register max-merge across epochs must equal the whole")
  }

  test("recoverStateTable resolves every crash window of the swap") {
    import spark.implicits._
    val st = "q152spec_recover"
    def mk(name: String, v: Long): Unit =
      Seq(("k", v)).toDF("k", "n").write.mode("overwrite").saveAsTable(name)
    def liveValue(): Long =
      spark.table(st).select("n").as[Long].head()
    scrub(st, s"${st}__next", s"${st}__old")

    // clean: nothing to do
    mk(st, 1L)
    assert(Incremental.recoverStateTable(spark, st) == "clean")
    assert(liveValue() == 1L)

    // crash between the renames: live gone, staged (newer) + old exist
    mk(s"${st}__next", 2L)
    mk(s"${st}__old", 1L)
    spark.sql(s"DROP TABLE $st")
    assert(Incremental.recoverStateTable(spark, st) == "completed-swap")
    assert(liveValue() == 2L)
    assert(!spark.catalog.tableExists(s"${st}__old"))
    assert(!spark.catalog.tableExists(s"${st}__next"))

    // crash after the second rename: dangling __old only
    mk(s"${st}__old", 1L)
    assert(Incremental.recoverStateTable(spark, st) == "dropped-old")
    assert(liveValue() == 2L)
    assert(!spark.catalog.tableExists(s"${st}__old"))

    // crash after staging, before the swap: stale __next dropped, the
    // intact live state is the recovery point (delta gets re-applied)
    mk(s"${st}__next", 9L)
    assert(Incremental.recoverStateTable(spark, st) == "dropped-stale-staging")
    assert(liveValue() == 2L)
    assert(!spark.catalog.tableExists(s"${st}__next"))

    // defensive: only __old survives — restore the prior snapshot
    spark.sql(s"ALTER TABLE $st RENAME TO ${st}__old")
    assert(Incremental.recoverStateTable(spark, st) == "restored-old")
    assert(liveValue() == 2L)
    scrub(st)
  }

  test("swap keeps committed state at every step: advance preserves the monoid result") {
    // the swap itself (rename-rename-drop) is exercised by every
    // advance; this pins that after an advance NO staging/old tables
    // dangle — the invariant recoverStateTable's "clean" branch needs
    val st = "q152spec_swapclean"
    scrub(st, s"${st}__next", s"${st}__old")
    val orders = Tables.table(spark, sf, "orders")
    Incremental.aggState(orders.where(expr("o_orderkey % 2 = 0")),
        group, "o_totalprice")
      .write.mode("overwrite").saveAsTable(st)
    Incremental.advanceStateTable(spark, st,
      orders.where(expr("o_orderkey % 2 = 1")), group, "o_totalprice")
    assert(!spark.catalog.tableExists(s"${st}__next"))
    assert(!spark.catalog.tableExists(s"${st}__old"))
    assert(Incremental.recoverStateTable(spark, st) == "clean")
    scrub(st)
  }
}
