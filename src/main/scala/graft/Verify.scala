package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name prefixes to run
    // (local iteration aid; the driver always runs the full surface)
    val only: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(",").toSeq) else None
    def selected(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the one true conf posture: GraftEngine.recommendedConfs
    val spark = graft.engine.GraftEngine
      .sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val lintFailures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => selected(name) }
        .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // Schema lint BEFORE the dump: a top-level array/map/struct
        // output column crashes the driver's pandas comparator (q25
        // round 1, q119 round 7) — fail here, loudly, not at the gate.
        val bad = graft.queries.SchemaLint.complexTopLevel(df.schema)
        if (bad.nonEmpty) {
          lintFailures += name
          System.err.println(
            s"[verify] SCHEMA LINT $name: top-level complex column(s) " +
            s"[${bad.mkString("; ")}] — the driver comparator cannot sort " +
            "array/map/struct cells; unwrap to scalars (q25 pattern) or " +
            "render to JSON (q53 pattern)")
        } else df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache() // drop per-query persisted intermediates
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (lintFailures.nonEmpty) {
      System.err.println(
        s"[verify] ${lintFailures.size} schema-lint failure(s): " +
        lintFailures.mkString(", "))
      sys.exit(1)
    }
  }
}
