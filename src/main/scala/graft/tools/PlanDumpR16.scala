package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Round-16 before/after plan dumps: writes
  * `plans/r16/<name>_<suffix>.txt` for each requested catalog query
  * (plus the maintained-pair advance-plan surfaces), in
  * `explain("formatted")` form.
  *
  * Usage: `runMain graft.tools.PlanDumpR16 <suffix> <names,csv> [sfDir]`
  *
  * The round-16 change under test (measured checkpoint-leaf
  * statistics) is visible in a STATIC explain: the iterative
  * operators build their checkpoints eagerly while the DataFrame is
  * constructed, so the dumped plan's join strategies over checkpoint
  * leaves (BroadcastHashJoin vs SortMergeJoin) reflect the leaf stats
  * directly — no exec mode needed for that rewrite (unlike r15's
  * AQE-runtime SHJ conversion).
  */
object PlanDumpR16 {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq.empty
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val outDir = "/root/repo/plans/r16"
    Files.createDirectories(Paths.get(outDir))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold",
        (10L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the maintained-pair advance surfaces (ExplainDump's builders)
    def pairsOf(s: SparkSession, d: String,
                pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val li = graft.ops.Tables.table(s, d, "lineitem")
        .where(col("l_partkey") % 3 === 0 && pred(col("l_orderkey")))
        .select(col("l_orderkey"), col("l_partkey"))
      li.join(li.select(col("l_orderkey"), col("l_partkey").as("__p2")),
          Seq("l_orderkey"))
        .where(col("l_partkey") < col("__p2"))
        .select(col("l_partkey").as("src"), col("__p2").as("dst"))
    }
    def scrub(s: SparkSession, name: String, derived: String): Unit =
      graft.ops.Tables.dropTablesAndDirs(s,
        s"${name}_edges", s"${name}_$derived",
        s"${name}_edges__next", s"${name}_${derived}__next",
        s"${name}_edges__old", s"${name}_${derived}__old")
    val advancePlans = Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame](
      "kcore_advance_plan" -> ((s: SparkSession, d: String) => {
        scrub(s, "plans_kc", "core")
        graft.ops.GraphState.initKCoreState(s, "plans_kc",
          pairsOf(s, d, ok => ok % 3 =!= 0), "src", "dst", k = 20)
        graft.ops.GraphState.advanceKCorePlan(s, "plans_kc",
          pairsOf(s, d, ok => ok % 3 === 0), "src", "dst", k = 20)._2
      }),
      "comm_advance_plan" -> ((s: SparkSession, d: String) => {
        scrub(s, "plans_cm", "comm")
        graft.ops.GraphState.initCommState(s, "plans_cm",
          pairsOf(s, d, ok => ok % 3 =!= 0), "src", "dst", iters = 2)
        graft.ops.GraphState.advanceCommPlan(s, "plans_cm",
          pairsOf(s, d, ok => ok % 3 === 0), "src", "dst", iters = 2)._2
      }),
      "anf_advance_plan" -> ((s: SparkSession, d: String) => {
        scrub(s, "plans_anf", "anf")
        graft.ops.GraphState.initAnfState(s, "plans_anf",
          pairsOf(s, d, ok => ok % 3 =!= 0), "src", "dst", t = 2)
        graft.ops.GraphState.advanceAnfPlan(s, "plans_anf",
          pairsOf(s, d, ok => ok % 3 === 0), "src", "dst", t = 2)._2
      }),
      "triangle_advance_plan" -> ((s: SparkSession, d: String) => {
        scrub(s, "plans_tri", "stats")
        graft.ops.GraphState.initTriangleState(s, "plans_tri",
          pairsOf(s, d, ok => ok % 3 =!= 0), "src", "dst")
        graft.ops.GraphState.advanceTrianglePlan(s, "plans_tri",
          pairsOf(s, d, ok => ok % 3 === 0), "src", "dst")._2
      }))

    val all = graft.queries.Catalog.queries ++ advancePlans
    names.foreach { n =>
      all.get(n) match {
        case Some(fn) =>
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val stable = plan.replaceAll("-pid\\d+", "-pidXXXX")
          Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), stable)
          println(s"dumped $n -> $outDir/${n}_$suffix.txt")
        case None => println(s"SKIP unknown query $n")
      }
    }
    spark.stop()
  }
}
