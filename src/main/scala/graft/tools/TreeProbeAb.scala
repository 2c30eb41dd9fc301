package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.ops.Similarity

/** Measured A/B for the coarse-quantizer TREE probe vs the flat probe
  * at production-sized nlist — the evidence that q145's tree closes the
  * one ANN envelope the q135 SCALING row documents: the flat
  * [[graft.functions.NearestCentroids]] scores ALL nlist centroids per
  * row, so with nlist grown alongside the corpus (the cells-stay-task-
  * sized rule) the assignment/probe stage is N·nlist; the tree
  * ([[graft.functions.TwoLevelNearestCentroids]]) makes it
  * N·(ntop + wprobe·nlist/ntop), √nlist-ish at ntop = √nlist.
  *
  * The measured stage is the corpus ASSIGNMENT scan (nearest-cell per
  * row → noop sink) — the probe-dominated stage both index builds and
  * anchors=corpus mining pay; candidate scans are identical between
  * the two and deliberately excluded. Per nlist ∈ {256, 1024, 4096}:
  * flat vs tree (ntop = √nlist, wprobe = 4), interleaved min-of-N,
  * plus the assignment agreement fraction (the approximation the tree
  * trades for the √ — rows whose true cell hides under an unprobed
  * coarse parent).
  *
  * Run after ScalingCurve has expanded /tmp/graft-scale (reuses its
  * embeddings); results recorded in SCALING.md. */
object TreeProbeAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_AB_DIR", "/tmp/graft-scale/x100")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "2").toInt
    require(rounds >= 1, s"SPARK_GRAFT_AB_ROUNDS must be >= 1, got $rounds")
    val nlists = sys.env.getOrElse("SPARK_GRAFT_AB_NLISTS", "256,1024,4096")
      .split(",").map(_.trim.toInt).toSeq
    val wprobe = sys.env.getOrElse("SPARK_GRAFT_AB_WPROBE", "4").toInt
    val spark = graft.engine.GraftEngine
      .sessionBuilder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    println(s"[ab] $dir: $n vectors, wprobe=$wprobe, rounds=$rounds")

    nlists.foreach { nlist =>
      val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", nlist)
      val ntop = math.max(1, math.round(math.sqrt(nlist.toDouble)).toInt)
      val (coarse, groups) = Similarity.twoLevelModel(cents, ntop)

      def flatAssign = emb.select(col("vec_id"),
        element_at(VectorFunctions.nearestCentroids(col("embedding"), cents, 1), 1)
          .as("cent_id"))
      def treeAssign = emb.select(col("vec_id"),
        element_at(VectorFunctions.twoLevelNearestCentroids(
          col("embedding"), coarse, groups, wprobe, 1), 1).as("cent_id"))

      def once(df: => org.apache.spark.sql.DataFrame): Double = {
        val t = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      // warm up BOTH shapes — each pays its own codegen/JIT, and a
      // one-round run must not hand the tree a cold-start advantage
      once(flatAssign); once(treeAssign)
      val results = for (r <- 1 to rounds; (name, thunk) <-
          Seq(("flat", () => flatAssign), ("tree", () => treeAssign))) yield {
        val dt = once(thunk())
        println(f"[ab] nlist=$nlist%5d ntop=$ntop%3d round $r $name%-5s $dt%7.2f s")
        (name, dt)
      }
      val minFlat = results.collect { case ("flat", dt) => dt }.min
      val minTree = results.collect { case ("tree", dt) => dt }.min
      val agree = flatAssign.withColumnRenamed("cent_id", "a")
        .join(treeAssign.withColumnRenamed("cent_id", "b"), Seq("vec_id"))
        .where(col("a") === col("b")).count()
      println(f"[ab] nlist=$nlist%5d MIN flat $minFlat%7.2f s  tree $minTree%7.2f s  " +
        f"speedup ${minFlat / minTree}%5.1fx  agreement ${agree.toDouble / n}%.4f")
    }
    spark.stop()
  }
}
