package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke-runs the driver contract exactly as the driver does: a fresh
  * session (no special confs) → SparkEntry.entry → rows>0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"ENTRYROWS=$n")
    require(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
