package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextOps._

/** Deduplication for training-data pipelines (north-star extension).
  *
  * Scale design: every variant avoids the n² pair space. Exact dedup
  * groups on a content hash (shuffle keyed on 16-byte digests, never raw
  * documents). Near-dup mining (MinHash-LSH, SimHash) shuffles only
  * (band, bucket, id) tuples; the quadratic blow-up is confined to
  * per-bucket candidate sets, then pruned by exact verification.
  */
object Dedup {

  /** Exact dedup: one representative (min id) per identical content.
    * Returns (h, keep_id, n_copies). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Keep only the representative rows (drop exact duplicates). */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(exact(df, idCol, textCol).select(col("keep_id").as(idCol)), Seq(idCol), "left_semi")

  /** MinHash signature: `numHashes` minima of per-shingle hashes.
    * Hash family: xxhash64(shingle, i) — one 64-bit hash per (shingle,
    * seed index), no string concatenation. */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shinglesCol, s => xxhash64(s, i))))

  /** LSH band buckets from a signature: `bands` buckets of `rows`
    * signature entries each (numHashes = bands * rows). */
  def lshBuckets(sigCol: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64((Seq[Column](b) ++ (0 until rows).map(r =>
        element_at(sigCol, b * rows + r + 1))): _*))

  /** Near-duplicate pairs by word-shingle Jaccard, MinHash-LSH candidate
    * generation + exact verification.
    *
    * With bands=32, rows=2 the probability of missing a pair at
    * jaccard >= 0.7 is (1 - 0.7²)^32 ≈ 4e-10 — effectively exact above
    * the threshold, while candidates stay near-linear in corpus size.
    * Returns (id_a, id_b, jaccard >= threshold).
    */
  def minhashJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          shingleN: Int = 3, threshold: Double = 0.7,
                          bands: Int = 32, rows: Int = 2): DataFrame = {
    val withSig = df
      .select(col(idCol), shingles(col(textCol), shingleN).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), bands * rows))
      .select(col(idCol), col("sh"),
        posexplode(lshBuckets(col("sig"), bands, rows)).as(Seq("band", "bucket")))
    val a = withSig.select(col(idCol).as("id_a"), col("sh").as("sh_a"), col("band"), col("bucket"))
    val b = withSig.select(col(idCol).as("id_b"), col("sh").as("sh_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .distinct()
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens. Pure column expressions: the
    * per-bit weighted vote is unrolled over 64 when/otherwise sums —
    * verbose but codegen-friendly (no UDF boxing on the 100 TB path). */
  def simhash64(textCol: Column): Column = {
    // hash every token exactly once, then take 64 per-bit votes over the
    // precomputed hash array (arithmetic only — no re-hashing per bit)
    val hs = transform(tokens(textCol), t => xxhash64(t))
    (0 until 64).map { bit =>
      val votes = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, bit).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Near-duplicate pairs by SimHash Hamming distance <= maxDist, using
    * 4×16-bit band exact-match candidates (guaranteed recall for
    * maxDist <= 3 by pigeonhole) + exact popcount verification. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val withSim = df.select(col(idCol), simhash64(col(textCol)).as("sim"))
      .withColumn("band", explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_id"),
          shiftright(col("sim"), b * 16).bitwiseAND(0xFFFFL).as("bucket"))): _*)))
      .select(col(idCol), col("sim"), col("band.band_id"), col("band.bucket"))
    val a = withSim.select(col(idCol).as("id_a"), col("sim").as("sim_a"), col("band_id"), col("bucket"))
    val b = withSim.select(col(idCol).as("id_b"), col("sim").as("sim_b"), col("band_id"), col("bucket"))
    a.join(b, Seq("band_id", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b")
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** Character n-gram Jaccard pairs (candidate generation shared with
    * MinHash-LSH over char shingles). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 5, threshold: Double = 0.7): DataFrame = {
    val withSh = df.select(col(idCol), charShingles(col(textCol), n).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), 64))
      .select(col(idCol), col("sh"),
        posexplode(lshBuckets(col("sig"), 32, 2)).as(Seq("band", "bucket")))
    val a = withSh.select(col(idCol).as("id_a"), col("sh").as("sh_a"), col("band"), col("bucket"))
    val b = withSh.select(col(idCol).as("id_b"), col("sh").as("sh_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .distinct()
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding near-duplicate pairs: exact all-pairs cosine (small/medium
    * corpora — codegen loop, broadcast one side) or LSH (see
    * [[Similarity.lshCosinePairs]]) for the 100 TB path. */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                           threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("vec_a"), col("vec_b")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
