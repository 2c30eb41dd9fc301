package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization for multi-dimensional scan pruning.
  *
  * Parquet scans prune row groups by min/max statistics. Sorting by a
  * single column clusters only that column; interleaving the bits of two
  * (or more) dimensions into a Z-order key and range-partition-sorting by
  * it gives every written file a tight min/max range on BOTH dimensions,
  * so a 100 TB scan filtered on either (or both) skips most files. The
  * key is pure integer arithmetic — codegen-friendly, engine-portable,
  * deterministic.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative int columns:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1L), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` clustered by the Z-order of two dimension columns:
    * range-partition on the z key (so files hold contiguous z ranges →
    * tight per-file min/max on both dims), sort within partitions, drop
    * the key. Use before a `.write` that downstream queries will filter
    * on either dimension. */
  def zorderBy(df: DataFrame, xCol: Column, yCol: Column,
               numPartitions: Int, bits: Int = 16): DataFrame = {
    val keyed = df.withColumn("__z", zValue(xCol, yCol, bits))
    keyed
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Write parquet with per-column BLOOM FILTERS — the point-lookup
    * lever min/max statistics cannot provide: on an UNSORTED layout a
    * high-cardinality id column's min/max spans every row group, so
    * `WHERE id = k` scans all of them; a bloom filter per row group
    * lets the reader skip groups that definitely lack k (false-positive
    * groups are still read — correctness never depends on the filter).
    * Sorted/Z-ordered layouts get this from min/max already; bloom is
    * for the columns you DIDN'T lay out by — secondary ids, join keys,
    * URL hashes — where re-sorting 100 TB for a second dimension is not
    * on the table.
    *
    * `expectedNdv` sizes the filter (parquet's split-block bloom):
    * per-row-group distinct count, not global — overshooting just
    * costs bytes. Readers need no opt-in: Spark's parquet scan consults
    * bloom filters during row-group pruning when a pushed equality
    * predicate matches a filtered column. */
  def writeWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                     expectedNdv: Long = 100000L): Unit = {
    require(bloomCols.nonEmpty, "at least one bloom column")
    // The per-column keys ride the write as .option()s: Spark folds
    // writer options into the PER-JOB hadoop conf
    // (FileFormatWriter → newHadoopConfWithOptions), so nothing global
    // is mutated and concurrent writes on the same session are safe
    // (footer-asserted by OpsSpec). Dictionary encoding is disabled on
    // the bloom columns: parquet-mr OMITS the bloom filter for a fully
    // dictionary-encoded chunk (the dictionary is already an exact
    // membership test), and a genuinely high-cardinality key — the only
    // kind worth blooming — gains nothing from a dictionary it would
    // overflow anyway.
    val kv = bloomCols.flatMap(c => Seq(
      s"parquet.bloom.filter.enabled#$c" -> "true",
      s"parquet.bloom.filter.expected.ndv#$c" -> expectedNdv.toString,
      s"parquet.enable.dictionary#$c" -> "false"))
    kv.foldLeft(df.write.mode("overwrite")) {
      case (w, (k, v)) => w.option(k, v)
    }.parquet(path)
  }

  /** Compact a parquet directory into ~`targetFileBytes` files — the
    * small-files lever: a heavily partitioned ingest (one file per
    * task per micro-batch per partition) leaves a 100 TB table as
    * hundreds of millions of KB-sized files, and every later scan pays
    * a listing + footer-read + task per file. Compaction sizes the
    * output to the DATA (ceil(inputBytes / target)), not to whatever
    * parallelism wrote it.
    *
    * `shuffle = true` (default) round-robin-repartitions — one shuffle
    * of the data being compacted, in exchange for evenly-sized files
    * (the posture for a table other jobs will scan forever).
    * `shuffle = false` coalesces — no shuffle, but file sizes inherit
    * the input's skew; right for one-off staging data.
    *
    * Writes to `destDir` (never in place: a lazy reader of `srcDir`
    * must not race its own overwrite). Returns the output file count.
    * The input bytes are the FS listing size; compressed output files
    * land near (often under) `targetFileBytes` — the point is the
    * count's ORDER, not byte-exact sizes. */
  /** The never-in-place guard, shared by every rewrite entry point:
    * compares FULLY QUALIFIED paths (scheme + authority resolved by
    * each path's own filesystem) and rejects ancestor/descendant
    * nesting — a raw Path comparison would let "/t" vs "file:/t" (or
    * a dest nested under src) through, and the overwrite would delete
    * the directory the lazy source read is about to scan. Returns the
    * qualified (srcFs, src, destFs, dest). */
  private def requireNotInPlace(spark: org.apache.spark.sql.SparkSession,
                                srcDir: String, destDir: String, what: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path,
         org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcFs = new org.apache.hadoop.fs.Path(srcDir).getFileSystem(conf)
    val destFs = new org.apache.hadoop.fs.Path(destDir).getFileSystem(conf)
    val src = srcFs.makeQualified(new org.apache.hadoop.fs.Path(srcDir))
    val dest = destFs.makeQualified(new org.apache.hadoop.fs.Path(destDir))
    def contains(a: org.apache.hadoop.fs.Path,
                 b: org.apache.hadoop.fs.Path): Boolean = {
      var p: org.apache.hadoop.fs.Path = b
      while (p != null) { if (p == a) return true; p = p.getParent }
      false
    }
    require(!contains(src, dest) && !contains(dest, src),
      s"$what is never in place (src=$src dest=$dest)")
    (srcFs, src, destFs, dest)
  }

  def compactTo(spark: org.apache.spark.sql.SparkSession,
                srcDir: String, destDir: String,
                targetFileBytes: Long = 128L * 1024 * 1024,
                shuffle: Boolean = true): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val (srcFs, src, destFs, dest) =
      requireNotInPlace(spark, srcDir, destDir, "compaction")
    val bytes = srcFs.getContentSummary(src).getLength
    val parts = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(srcDir)
    val sized = if (shuffle) df.repartition(parts) else df.coalesce(parts)
    sized.write.mode("overwrite").parquet(destDir)
    // the listing goes through DEST's filesystem — src and dest may
    // legitimately live on different stores (local staging → object store)
    destFs.listStatus(dest).count(f => f.getPath.getName.endsWith(".parquet") &&
      !f.getPath.getName.startsWith("_"))
  }

  /** ONE-REWRITE table maintenance — the OPTIMIZE shape, composing the
    * three individually-oracled layout levers (q131 compaction, q79
    * Z-order, q121 blooms) the way an operator actually runs them:
    * read the (small-files) source ONCE, range-partition by the
    * Z-order key into data-sized partitions, sort within, and write
    * WITH bloom filters on the secondary keys — one read + one write.
    * Running the three as separate rewrites would read and write the
    * table three times; at 100 TB the rewrite IS the cost, so layout
    * decisions must share one pass. Compaction sizing, the
    * never-in-place qualified-path guard, per-job bloom options, and
    * the Z-clustering contract are each inherited verbatim from their
    * single-purpose operators (and their specs).
    *
    * Returns (nFilesBefore, bytesBefore, nFilesAfter, bytesAfter) —
    * the before/after evidence a maintenance job reports. */
  def optimizeTable(spark: org.apache.spark.sql.SparkSession,
                    srcDir: String, destDir: String,
                    zX: Column, zY: Column,
                    bloomCols: Seq[String],
                    targetFileBytes: Long = 128L * 1024 * 1024,
                    expectedNdv: Long = 100000L,
                    bits: Int = 16): (Int, Long, Int, Long) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    // composed, not re-implemented: the guard, the clustering, and the
    // bloom write are the single-purpose operators verbatim — one
    // place for each to evolve (round-9 review)
    val (srcFs, src, destFs, dest) =
      requireNotInPlace(spark, srcDir, destDir, "optimize")
    def stats(fs: org.apache.hadoop.fs.FileSystem,
              p: org.apache.hadoop.fs.Path): (Int, Long) = {
      val files = fs.listStatus(p).filter(f =>
        f.getPath.getName.endsWith(".parquet") && !f.getPath.getName.startsWith("_"))
      (files.length, files.map(_.getLen).sum)
    }
    val (nBefore, bytesBefore) = stats(srcFs, src)
    val parts = math.max(1, math.ceil(bytesBefore.toDouble / targetFileBytes).toInt)
    writeWithBloom(
      zorderBy(spark.read.parquet(srcDir), zX, zY, parts, bits),
      destDir, bloomCols, expectedNdv)
    val (nAfter, bytesAfter) = stats(destFs, dest)
    (nBefore, bytesBefore, nAfter, bytesAfter)
  }

  /** Content manifest of a sharded corpus snapshot: per shard —
    * row count and an ORDER-FREE exact content digest (the sum of a
    * 60-bit md5 lane per row, exact in DECIMAL — commutative, so the
    * digest is invariant under partitioning/order and replayable in
    * any engine; a cryptographic accumulator it is not, an integrity
    * check against row loss/duplication/corruption it is). `repr`
    * must render the row canonically (concat the columns with a
    * separator that cannot appear in the data). */
  def snapshotManifest(df: DataFrame, shard: Column,
                       repr: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    df.groupBy(shard.cast("int").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(conv(substring(md5(repr), 1, 15), 16, 10).cast("long")
          .cast(DecimalType(20, 0))).as("__d"))
      .select(col("shard"), col("n_rows"),
        col("__d").cast("string").as("digest"))
  }

  /** SQL twin of [[snapshotManifest]]'s digest aggregate (DuckDB sums
    * BIGINT into HUGEINT; both engines render the exact integer). */
  def snapshotDigestSql(repr: String): String =
    s"CAST(CAST(sum(('0x' || substr(md5($repr), 1, 15))::BIGINT) " +
      s"AS HUGEINT) AS VARCHAR)"

  /** Export a corpus snapshot as shard-partitioned parquet and return
    * the manifest computed from the WRITTEN data (read back — the
    * manifest certifies what landed on storage, not what was meant
    * to): the reproducible-release shape. A consumer re-derives the
    * digests from its copy and compares strings; any lost, duplicated
    * or bit-flipped row changes a shard digest. One corpus write + one
    * read; the manifest aggregate is one map-side-combined exchange to
    * a shard-count table. */
  def writeSnapshotWithManifest(df: DataFrame, shard: Column,
                                reprOf: DataFrame => Column,
                                outDir: String): DataFrame = {
    df.withColumn("__shard", shard.cast("int"))
      .write.mode("overwrite").partitionBy("__shard").parquet(outDir)
    val back = df.sparkSession.read.parquet(outDir)
    snapshotManifest(back, col("__shard"), reprOf(back))
  }
}
