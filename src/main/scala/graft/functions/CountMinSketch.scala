package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch: mergeable approximate frequency counting — the
  * heavy-hitter / frequency complement to the HLL distinct-count surface
  * (q75). A (depth × width) counter grid; every key increments one
  * counter per lane (row), a point estimate is the MIN over its lane
  * counters: never an undercount, overcount bounded by ~2N/width per
  * lane with high probability.
  *
  * Scale design: the pre-aggregate/re-aggregate pattern — per-partition
  * (or per-day) sketches collapse map-side through the Aggregator's
  * partial reduce, the shuffle carries depth×width longs per group, and
  * sketches for any key range union with exact elementwise addition
  * ([[CountMinUnion]]). Because merge is plain addition, the merged
  * sketch is BIT-IDENTICAL however the data was partitioned — asserted
  * in the spec, a stronger property than HLL's approximate merge.
  *
  * Hashing is XXH64 with the lane index as seed (fixed, deterministic
  * across runs and engines). */
case class CmsBuffer(counters: Array[Long])

class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[Long, CmsBuffer, Array[Long]] {

  override def zero: CmsBuffer = CmsBuffer(Array.empty)

  private def ensure(b: CmsBuffer): Array[Long] =
    if (b.counters.isEmpty) new Array[Long](depth * width) else b.counters

  override def reduce(b: CmsBuffer, key: Long): CmsBuffer = {
    val c = ensure(b)
    var i = 0
    while (i < depth) {
      c(i * width + CountMin.lane(key, i, width)) += 1L
      i += 1
    }
    CmsBuffer(c)
  }

  override def merge(a: CmsBuffer, b: CmsBuffer): CmsBuffer = {
    if (a.counters.isEmpty) b
    else if (b.counters.isEmpty) a
    else {
      val c = a.counters
      var i = 0
      while (i < c.length) { c(i) += b.counters(i); i += 1 }
      CmsBuffer(c)
    }
  }

  override def finish(r: CmsBuffer): Array[Long] = ensure(r)
  override def bufferEncoder: Encoder[CmsBuffer] = Encoders.product[CmsBuffer]
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Union of count-min sketches: exact elementwise addition. */
class CountMinUnion(depth: Int, width: Int)
    extends Aggregator[Array[Long], CmsBuffer, Array[Long]] {

  override def zero: CmsBuffer = CmsBuffer(Array.empty)

  override def reduce(b: CmsBuffer, sk: Array[Long]): CmsBuffer =
    merge(b, CmsBuffer(sk.clone()))

  override def merge(a: CmsBuffer, b: CmsBuffer): CmsBuffer = {
    if (a.counters.isEmpty) b
    else if (b.counters.isEmpty) a
    else {
      val c = a.counters
      var i = 0
      while (i < c.length) { c(i) += b.counters(i); i += 1 }
      CmsBuffer(c)
    }
  }

  override def finish(r: CmsBuffer): Array[Long] =
    if (r.counters.isEmpty) new Array[Long](depth * width) else r.counters
  override def bufferEncoder: Encoder[CmsBuffer] = Encoders.product[CmsBuffer]
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CountMin {
  val DefaultDepth = 4
  val DefaultWidth = 1024

  /** Lane index of `key` in row `seed` — deterministic XXH64. */
  def lane(key: Long, seed: Int, width: Int): Int =
    math.floorMod(XXH64.hashLong(key, seed.toLong), width).toInt

  /** Aggregate column: count-min sketch (array<bigint> of depth×width)
    * over a long key column. */
  def agg(key: Column, depth: Int = DefaultDepth,
          width: Int = DefaultWidth): Column =
    udaf(new CountMinAgg(depth, width), Encoders.scalaLong).apply(key)

  /** Aggregate column: union (exact elementwise sum) of sketches. */
  def unionAgg(sketch: Column, depth: Int = DefaultDepth,
               width: Int = DefaultWidth): Column =
    udaf(new CountMinUnion(depth, width),
      ExpressionEncoder[Array[Long]]()).apply(sketch)

  /** Point frequency estimate for a LITERAL key: the lane indices are
    * compile-time constants, so the estimate is a pure `least` over
    * `element_at`s — no UDF on the read path. */
  def estimate(sketch: Column, key: Long, depth: Int = DefaultDepth,
               width: Int = DefaultWidth): Column =
    least((0 until depth).map(i =>
      element_at(sketch, i * width + lane(key, i, width) + 1)): _*)

  /** Driver-side estimate over a collected sketch (for tests/tools). */
  def estimateLocal(sketch: Array[Long], key: Long,
                    depth: Int = DefaultDepth,
                    width: Int = DefaultWidth): Long =
    (0 until depth).map(i => sketch(i * width + lane(key, i, width))).min
}
