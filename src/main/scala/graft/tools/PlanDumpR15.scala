package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Round-15 optimization-evidence dumper: writes
  * `plans/r15/<name>_<suffix>.txt` — the `.explain("formatted")` output
  * of each named query (or maintained-pair advance surface) — so the
  * before/after plan claims in OPTIMIZATION_r15.md are checkable
  * without running Spark. Usage:
  *   runMain graft.tools.PlanDumpR15 <before|after> <name1,name2,...>
  * Names resolve through the catalog; the maintained-pair advance
  * surfaces accept the ExplainDump pseudo-names
  * (`anf_advance_plan`, `triangle_advance_plan`, `kcore_advance_plan`,
  * `comm_advance_plan`). */
object PlanDumpR15 {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq.empty
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val outDir = "/root/repo/plans/r15"
    // "exec..." suffixes EXECUTE the query first and dump the FINAL
    // adaptive plan (isFinalPlan=true) — the only way to show AQE
    // runtime rewrites (SMJ→SHJ conversion, coalesced reads), which a
    // static explain cannot. SPARK_GRAFT_PLANDUMP_SHJ=1 applies the
    // engine's maxShuffledHashJoinLocalMapThreshold so an
    // execbefore/execafter pair isolates exactly that conf.
    val exec = suffix.startsWith("exec")
    Files.createDirectories(Paths.get(outDir))
    // value-checked (ADVICE r15): "0"/"false"/anything but "1" keeps the
    // Spark default, so an execbefore/execafter pair can't be silently
    // produced with the conf ON in both legs
    val shj = sys.env.get("SPARK_GRAFT_PLANDUMP_SHJ").filter(_ == "1")
      .map(_ => (64L * 1024 * 1024).toString).getOrElse("0")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", shj)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

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
    val advanceSurfaces: Map[String, (SparkSession, String) => DataFrame] = Map(
      "triangle_advance_plan" -> ((s: SparkSession, d: String) => {
        scrub(s, "r15_tri", "stats")
        graft.ops.GraphState.initTriangleState(s, "r15_tri",
          pairsOf(s, d, ok => ok % 3 =!= 0), "src", "dst")
        graft.ops.GraphState.advanceTrianglePlan(s, "r15_tri",
          pairsOf(s, d, ok => ok % 3 === 0), "src", "dst")._2
      }),
      "kcore_advance_plan" -> ((s: SparkSession, d: String) => {
        scrub(s, "r15_kc", "core")
        graft.ops.GraphState.initKCoreState(s, "r15_kc",
          pairsOf(s, d, ok => ok % 3 =!= 0), "src", "dst", k = 20)
        graft.ops.GraphState.advanceKCorePlan(s, "r15_kc",
          pairsOf(s, d, ok => ok % 3 === 0), "src", "dst", k = 20)._2
      }),
      "kcore_retract_plan" -> ((s: SparkSession, d: String) => {
        scrub(s, "r15_kcr", "core")
        graft.ops.GraphState.initKCoreState(s, "r15_kcr",
          pairsOf(s, d, ok => ok % 3 =!= 0), "src", "dst", k = 20)
        graft.ops.GraphState.retractKCorePlan(s, "r15_kcr",
          pairsOf(s, d, ok => ok % 3 =!= 0)
            .where((col("src") + col("dst")) % 11 === 0),
          "src", "dst", k = 20)._2
      }),
      "comm_advance_plan" -> ((s: SparkSession, d: String) => {
        scrub(s, "r15_cm", "comm")
        graft.ops.GraphState.initCommState(s, "r15_cm",
          pairsOf(s, d, ok => ok % 3 =!= 0), "src", "dst", iters = 2)
        graft.ops.GraphState.advanceCommPlan(s, "r15_cm",
          pairsOf(s, d, ok => ok % 3 === 0), "src", "dst", iters = 2)._2
      }),
      "anf_advance_plan" -> ((s: SparkSession, d: String) => {
        scrub(s, "r15_anf", "anf")
        graft.ops.GraphState.initAnfState(s, "r15_anf",
          pairsOf(s, d, ok => ok % 3 =!= 0), "src", "dst", t = 2)
        graft.ops.GraphState.advanceAnfPlan(s, "r15_anf",
          pairsOf(s, d, ok => ok % 3 === 0), "src", "dst", t = 2)._2
      }))
    val catalog = graft.queries.Catalog.queries ++ advanceSurfaces
    names.foreach { name =>
      catalog.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          if (exec) { df.collect(); () }
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val stable = plan.replaceAll("-pid\\d+", "-pidXXXX")
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), stable)
          println(s"wrote $outDir/${name}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
