package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.ops.{Bucketing, Tables}

/** Bucketed joins must be exchange-free: the shuffle is paid once at
  * write time, not on every join. */
class BucketingSpec extends SparkSpec {

  private def dropHard(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(s"spark-warehouse/$table")
    if (loc.exists()) {
      loc.listFiles().foreach(_.delete()); loc.delete()
    }
  }

  test("join of two same-bucketed tables plans without a shuffle exchange") {
    dropHard("orders_b"); dropHard("lineitem_b")
    Bucketing.writeBucketed(Tables.table(spark, sf, "orders"),
      "orders_b", "o_orderkey", 4, sortCol = Some("o_orderkey"))
    Bucketing.writeBucketed(Tables.table(spark, sf, "lineitem"),
      "lineitem_b", "l_orderkey", 4, sortCol = Some("l_orderkey"))

    val joined = Bucketing.bucketedJoin(spark, "lineitem_b", "orders_b",
      "l_orderkey", "o_orderkey")
    val plan = joined.queryExecution.executedPlan
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"bucketed join must not shuffle, plan:\n${plan.treeString}")
    assert(joined.count() == 6000) // every lineitem row matches its order
  }
}
