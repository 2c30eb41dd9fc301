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
}
