package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: concatenate documents in a
  * deterministic order and split the token stream into fixed-length
  * context windows ("concat-and-chunk").
  *
  * Scale design: a single global document order would funnel the corpus
  * through one task (the same single-partition-window trap the IVF
  * centroid pick fell into in round 1), so the stream is sharded by a
  * deterministic function of the id. Each shard packs independently with
  * a per-shard window cumsum — shards are the unit of parallelism (pick
  * numShards ≈ a few × executor count), and a pack is identified by
  * (shard, pack) so ids never collide across shards. Assignment is a
  * pure function of (id, token counts), reproducible across runs and
  * partitionings like [[Sampling]].
  */
object Packing {

  /** Assign every document to a context-window pack. Within shard
    * `id % numShards`, documents are ordered by id; a document's pack is
    * `floor(start_offset / ctxLen)` where start_offset is the sum of
    * token counts of all earlier documents in the shard. Adds columns
    * (shard, start_offset, pack). */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    ctxLen: Int, numShards: Int): DataFrame = {
    require(ctxLen > 0 && numShards > 0, "ctxLen and numShards must be positive")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", pmod(col(idCol), lit(numShards.toLong)))
      .withColumn("start_offset",
        coalesce(sum(col(tokensCol).cast("long")).over(w), lit(0L)))
      .withColumn("pack", floor(col("start_offset") / lit(ctxLen.toDouble)).cast("long"))
  }

  /** First-fit-decreasing bin packing — the batch-builder shape that
    * keeps every document WHOLE (vs [[packSequences]], which
    * concatenates and splits documents across context windows): within
    * shard `id % numShards`, documents sort by (len DESC, id ASC) and
    * each takes the lowest-indexed bin it fits; no bin exceeds
    * `capacity` (oversize documents ride alone, flagged). The greedy
    * is deterministic — a pure function of each shard's item SET — so
    * the whole operator carries a differential oracle (q137: DuckDB
    * replays the same greedy as a recursive CTE over list state).
    *
    * Scale design: one (shard)-keyed exchange collects each shard's
    * (len, id) pairs — 16 bytes per document, never text — and the
    * pack runs as ONE compiled expression per shard
    * ([[graft.functions.FfdPack]]). Shards are the parallelism unit:
    * size numShards to a few × executor count and to keep each
    * shard's item count in memory (items, not documents). FFD is a
    * 11/9·OPT + 6/9 approximation — near-optimal fill with zero
    * cross-document token leakage, the trade the no-split contract
    * buys.
    *
    * Returns (shard, idCol, len, bin, oversize) — bin is 1-based and
    * unique within a shard. */
  def ffdPack(df: DataFrame, idCol: String, lenCol: String,
              capacity: Long, numShards: Int): DataFrame = {
    require(capacity >= 1 && numShards >= 1,
      s"capacity and numShards must be positive: $capacity, $numShards")
    // Enforce the hard-bound contract instead of silently breaking it
    // (the budgetSelect discipline): a NULL length would read as 0
    // through the packed struct — the document "fits" every bin while
    // its real tokens overflow the context downstream — and a negative
    // length corrupts every fill after it. raise_error at the first
    // offender, row-local, no extra validation scan.
    val lenGuarded = when(col(lenCol).isNull || col(lenCol) < 0, raise_error(concat(
        lit(s"ffdPack: null/negative length in '$lenCol' for id="),
        col(idCol).cast("string"))).cast("long"))
      .otherwise(col(lenCol).cast("long"))
    df.select(pmod(col(idCol), lit(numShards.toLong)).as("shard"),
        struct(lenGuarded.as("len"),
          col(idCol).cast("long").as("id")).as("__it"))
      .groupBy("shard")
      .agg(collect_list(col("__it")).as("__items"))
      .select(col("shard"),
        explode(graft.functions.FfdPack.pack(col("__items"), capacity)).as("__p"))
      .select(col("shard"), col("__p.id").as(idCol), col("__p.len").as("len"),
        col("__p.bin").as("bin"), col("__p.oversize").as("oversize"))
  }
}
