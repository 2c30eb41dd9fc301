package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Portable mergeable quantile sketch over CONTINUOUS double domains —
  * the missing corpus-scale percentile path the counting-CDF family
  * ([[graft.ops.Profile.exactQuantilesBy]]) cannot serve: that
  * machinery's intermediate table is VALUE-DOMAIN-sized and its
  * contract is integral values, so model scores, cosine distances and
  * float losses (domain ≈ corpus) had no operator class.
  *
  * Design — an HDR-histogram-style log-linear register sketch (per
  * power-of-two range, `2^s` linear sub-buckets; the same bucket
  * layout HdrHistogram and base-2 DDSketch variants use), chosen over
  * KLL for one decisive property: EVERY derivation step is exact IEEE
  * arithmetic, so the registers — and therefore the estimates — are
  * bit-portable across engines and the whole operator gets the full
  * rows+schema+hash differential oracle, where KLL's randomized
  * compactors could never be replayed in SQL. The cost vs KLL is a
  * register count that grows with the data's DYNAMIC RANGE (≤ 2^s per
  * octave, ≤ ~2^s·124 per sign in the worst case, hundreds for real
  * data spanning a few decades) instead of a fixed k — an excellent
  * trade at 2^s = 128.
  *
  * Bucket id of a double `v` (`s` sub-bucket bits):
  *   - v = 0 (±0)                 → 0
  *   - 0 < |v| < 2^-62            → ±1              (underflow register)
  *   - 2^-62 ≤ |v| < 2^62         → ±((e+62)·2^s + sub + 2) where
  *     e = floor(log2 |v|) and sub = the top s bits of the mantissa —
  *     i.e. |v| ∈ [2^e·(1+sub/2^s), 2^e·(1+(sub+1)/2^s))
  *   - |v| ≥ 2^62 (incl. ±Inf)    → ±(124·2^s + 2)  (overflow register)
  *   - NaN                        → +(124·2^s + 2)  (deterministic;
  *     filter NaN upstream if it should not count)
  *
  * The id is MONOTONE in v (negatives mirror through negation), so a
  * per-group cumulative count over ids ordered ascending is an exact
  * CDF over buckets. Every arithmetic step is exact: the exponent and
  * mantissa come straight from the IEEE bit pattern here, and the SQL
  * twin derives the same integers from `log2` CORRECTED by exact
  * power-of-two comparisons (multiply/divide by 2^k and `x − 1` for
  * x ∈ [1,2) are rounding-free), so both engines emit identical
  * bucket ids with zero FP-portability caveats.
  *
  * [[HdrQuantile.decodeLower]] maps an id back to its bucket's
  * lower-|value| edge — again all-exact arithmetic (`2^e·(1+sub/2^s)`
  * is one scalb of a ≤(s+1)-bit fraction). A quantile estimated as
  * the decoded edge of the bucket containing the true rank therefore
  * carries a GUARANTEED relative error < 2^-s (bucket width over
  * bucket lower edge) for values in the normal range — s = 7 gives
  * < 0.79%.
  */
object HdrQuantile {

  /** Normal-range octaves: |v| ∈ [2^MinExp, 2^MaxExp). Chosen so every
    * power of two in range is an exact BIGINT shift in SQL (`1 << k`,
    * k ≤ 62) — scores, distances, losses, latencies and money all live
    * orders of magnitude inside it. */
  val MinExp: Int = -62
  val MaxExp: Int = 62

  /** Default sub-bucket bits: relative error < 2^-7 ≈ 0.79%, ≤ 128
    * registers per octave. */
  val DefaultS: Int = 7

  def overflowId(s: Int): Long = (124L << s) + 2L

  /** Encoded register id of `v` — bit-pattern derivation (exact; the
    * codegen body of [[HdrBucket]]). */
  def bucketOf(v: Double, s: Int): Long = {
    if (java.lang.Double.isNaN(v)) return overflowId(s)
    if (v == 0.0) return 0L
    val a = math.abs(v)
    val pid =
      if (a < java.lang.Math.scalb(1.0, MinExp)) 1L
      else if (a >= java.lang.Math.scalb(1.0, MaxExp)) overflowId(s)
      else {
        val bits = java.lang.Double.doubleToRawLongBits(a)
        val e = ((bits >>> 52) & 0x7ffL).toInt - 1023
        val sub = (bits & ((1L << 52) - 1)) >>> (52 - s)
        ((e + 62).toLong << s) + sub + 2L
      }
    if (v > 0) pid else -pid
  }

  /** Lower-|value| edge of register `id` (sign-mirrored; the codegen
    * body of [[HdrDecodeLower]]). The zero and underflow registers
    * decode to 0.0 — their honest lower edge. */
  def decodeLower(id: Long, s: Int): Double = {
    val m = math.abs(id)
    val mag =
      if (m <= 1L) 0.0
      else if (m >= overflowId(s)) java.lang.Math.scalb(1.0, MaxExp)
      else {
        val t = m - 2L
        val e = (t >> s).toInt - 62
        val sub = t & ((1L << s) - 1)
        java.lang.Math.scalb(1.0 + sub.toDouble / (1L << s).toDouble, e)
      }
    if (id >= 0) mag else -mag
  }
}

/** [[HdrQuantile.bucketOf]] as one compiled codegen node (double →
  * bucket id). `s` is a plan-time constant, not a child expression. */
case class HdrBucket(child: Expression, s: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(s >= 1 && s <= 20, s"sub-bucket bits must be in [1,20], got $s")

  override def prettyName: String = "graft_hdr_bucket"
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = LongType

  protected override def nullSafeEval(input: Any): Any =
    HdrQuantile.bucketOf(input.asInstanceOf[Double], s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HdrQuantile.bucketOf($c, $s)")

  override protected def withNewChildInternal(newChild: Expression): HdrBucket =
    copy(child = newChild)
}

/** [[HdrQuantile.decodeLower]] as one compiled codegen node (bucket id
  * → lower edge double). */
case class HdrDecodeLower(child: Expression, s: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(s >= 1 && s <= 20, s"sub-bucket bits must be in [1,20], got $s")

  override def prettyName: String = "graft_hdr_decode_lower"
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = DoubleType

  protected override def nullSafeEval(input: Any): Any =
    HdrQuantile.decodeLower(input.asInstanceOf[Long], s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HdrQuantile.decodeLower($c, $s)")

  override protected def withNewChildInternal(newChild: Expression): HdrDecodeLower =
    copy(child = newChild)
}
