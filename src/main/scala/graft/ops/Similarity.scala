package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over embedding columns (north-star extension).
  *
  * Three tiers, by scale:
  *   - [[bruteForceTopK]] — exact; broadcast the (small) query set against
  *     the full corpus. Cost |Q|·|V|·dim with a codegen inner loop; the
  *     corpus is never shuffled, so it parallelizes linearly with
  *     executors. Right up to |Q| in the thousands at 100 TB corpus scale.
  *   - [[lshCosinePairs]] — all-pairs near-neighbor mining via
  *     random-hyperplane LSH: L independent tables of `bits` sign-bits
  *     each; candidates = bucket co-residents; exact cosine verify.
  *     Shuffles only (id, bucket) pairs, never the n² pair space.
  *   - [[ivfTopK]] — IVF-style: partition the corpus by nearest centroid,
  *     probe the `nprobe` closest centroids per query. Trades recall for
  *     a |Q|·|V|/k scan.
  *
  * All randomness is deterministic (fixed seed) so results are
  * reproducible across runs and engines.
  */
object Similarity {

  /** Cosine similarity via built-in higher-order functions only (no custom
    * expression) — kept as the portable fallback and for plan comparison
    * in the bench. */
  def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    val nb = aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / (sqrt(na) * sqrt(nb)))
  }

  /** Codegen cosine (preferred). */
  def cosine(a: Column, b: Column): Column = VectorFunctions.cosine(a, b)

  /** Exact top-k neighbors for each query vector.
    *
    * `queries` is broadcast: the corpus side stays partition-local (no
    * shuffle of the big side); the per-query top-k runs through a window
    * after the map-side cross product.
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int): DataFrame = {
    val joined = Tables.spread(corpus, idCol)
      .crossJoin(broadcast(queries))
      .where(col(qidCol) =!= col(idCol))
      .withColumn("cos", cosine(col(qvecCol), col(vecCol)))
    val w = Window.partitionBy(qidCol).orderBy(col("cos").desc, col(idCol).asc)
    joined
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("cos"))
  }

  /** Deterministic pseudo-random hyperplanes: `l` tables × `bits` planes
    * of dimension `dim`, values in [-1, 1) derived from a fixed seed. */
  private[graft] def hyperplanes(dim: Int, bits: Int, l: Int, seed: Long = 42L): Array[Array[Array[Float]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(l, bits, dim)((rnd.nextFloat() * 2f) - 1f)
  }

  /** Sign-bit bucket id of a vector under one table's hyperplanes. */
  private def bucketCol(vecCol: Column, planes: Array[Array[Float]]): Column = {
    planes.zipWithIndex.map { case (p, i) =>
      val pc = array(p.map(v => lit(v)).toIndexedSeq: _*)
      when(VectorFunctions.dot(vecCol, pc) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** All pairs with cosine >= threshold, via multi-table sign-LSH +
    * exact verification. Only candidate pairs (same table, same bucket)
    * are materialized; the exact cosine then prunes false positives. */
  def lshCosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, bits: Int = 8, tables: Int = 12,
                     dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bits, tables, seed)
    // (id, vec, table, bucket) — one row per table per vector
    val buckets = Tables.spread(vectors, idCol).select(
      col(idCol), col(vecCol),
      posexplode(array(planes.toIndexedSeq.map(t => bucketCol(col(vecCol), t)): _*))
        .as(Seq("table_id", "bucket")))
    val a = buckets.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
      col("table_id"), col("bucket"))
    val b = buckets.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
      col("table_id"), col("bucket"))
    a.join(b, Seq("table_id", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("vec_a"), col("vec_b"))
      .distinct() // a pair may collide in several tables
      .withColumn("cos", cosine(col("vec_a"), col("vec_b")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** IVF top-k: centroids are `nlist` hash-selected corpus vectors
    * (deterministic); corpus rows are assigned to their nearest centroid
    * once, queries probe the `nprobe` nearest centroid cells. */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    // Centroid pick must survive 100 TB: take the nlist smallest
    // xxhash64(id) values — a pseudo-random but deterministic sample that
    // compiles to TakeOrderedAndProject (per-partition partial top-nlist,
    // tiny driver-side merge). No corpus.count() action, no global
    // single-partition Window.orderBy.
    val centroids = corpus
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))
      .orderBy(xxhash64(col("cent_id")).asc, col("cent_id").asc)
      .limit(nlist)

    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(id).orderBy(cosine(col(vec), col("cent_vec")).desc)
      df.crossJoin(broadcast(centroids))
        .withColumn("__cr", row_number().over(w))
        .where(col("__cr") <= keep)
        .drop("cent_vec", "__cr")
    }

    val corpusCells = assign(corpus, idCol, vecCol, 1)
    val queryCells = assign(queries, qidCol, qvecCol, nprobe)
    val w = Window.partitionBy(qidCol).orderBy(col("cos").desc, col(idCol).asc)
    queryCells.join(corpusCells, Seq("cent_id"))
      .where(col(qidCol) =!= col(idCol))
      .withColumn("cos", cosine(col(qvecCol), col(vecCol)))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("cos"))
  }
}
