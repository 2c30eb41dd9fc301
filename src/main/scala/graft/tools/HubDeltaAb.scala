package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Checkpointing, Graph}

/** Hub-delta micro A/B for the delta-triangle expansion orientation
  * (round-13 verdict What's-wrong #3 / stretch #8): a synthetic star
  * hub (node 0 adjacent to 1..N, with a rim path closing triangles)
  * takes a delta of edges touching the hub. Under smaller-ID
  * expansion every delta edge (0, x) enumerates the HUB's N
  * neighbors (0 is the smaller id); under the round-14
  * smaller-DEGREE orientation it enumerates the rim endpoint's ≤3.
  * Run the same binary against the r13 worktree for the A/B —
  * results must be checksum-identical, only the candidate volume
  * (and wall time) moves.
  *
  * Run: `runMain graft.tools.HubDeltaAb` (env SPARK_GRAFT_HUB_N,
  * default 200000; SPARK_GRAFT_HUB_D, default 200 delta edges).
  */
object HubDeltaAb {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_HUB_N", "200000").toLong
    val dN = sys.env.getOrElse("SPARK_GRAFT_HUB_D", "200").toLong
    val spark = graft.engine.GraftEngine.sessionBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // star (0, i) + rim path (i, i+1): triangles (0, i, i+1)
    val base = Checkpointing.truncateSer(
      spark.range(1L, n + 1L).select(lit(0L).as("src"), col("id").as("dst"))
        .unionAll(spark.range(1L, n).select(col("id").as("src"),
          (col("id") + 1L).as("dst"))))
    // delta: new rim nodes hanging off the hub, consecutive pairs
    // closing fresh triangles — every delta edge touches node 0 or a
    // degree-≤3 rim node
    val delta = Checkpointing.truncateSer(
      spark.range(n + 1L, n + 1L + dN)
        .select(lit(0L).as("src"), col("id").as("dst"))
        .unionAll(spark.range(n + 1L, n + dN)
          .select(col("id").as("src"), (col("id") + 1L).as("dst"))))
    val prev = Checkpointing.truncateSer(
      Graph.triangleStats(base, "src", "dst"))
    println(s"| hub N $n | delta edges ${delta.count()} |")
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    println("| leg | advance (s) | tri3 | nodes |")
    for (leg <- 1 to 3) {
      val (t, c) = time {
        val r = Graph.advanceTriangleStats(prev, base, "src", "dst", delta)
          .agg(sum("n_triangles"), count(lit(1))).head()
        (r.getLong(0), r.getLong(1))
      }
      println(f"| $leg | $t%.2f | ${c._1} | ${c._2} |")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
