package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable sketches: HyperLogLog distinct-count and Count-Min
  * frequency, built ONLY from operations every SQL engine evaluates
  * bit-identically (md5, hex parsing, integer shifts, `bin`, IEEE
  * double +,-,*,/ in a fixed expression order). The point is the
  * differential-testing property the engine-internal sketches
  * (Spark's HLL++/Datasketches, the XXH64 [[CountMin]]) cannot have:
  * a DuckDB oracle recomputes the ESTIMATES verbatim, so the
  * approximate operators get full rows+schema+hash checks instead of
  * rows-only escapes.
  *
  * Relational shape (the Spark-first form of "mergeable sketch"): a
  * sketch is a small set of (bucket, register) / (lane, bucket, count)
  * rows. Pre-aggregation = groupBy to those rows (map-side combine,
  * shuffle carries ≤ m rows per group); merge = max (HLL) / sum (CMS)
  * over the same keys — associative, so daily→total re-aggregation is
  * exact by construction, the same property the object sketches prove
  * in their specs.
  *
  * The one genuinely engine-risky spot is the HLL small-range branch:
  * linear counting needs ln(m/V), and libm `ln` differs across
  * engines in the last ulp (measured on this box: 6/5000 arguments for
  * `log`). [[lnOfInt]] therefore computes ln of the INTEGER V with a
  * fixed range-reduction (bit length via `bin`) and a 7-term atanh
  * Horner series — pure +,-,*,/ on doubles in one documented order, so
  * both engines produce the same 64 bits. Series truncation error is
  * < 5e-12 relative (|z| ≤ 0.2), irrelevant next to the estimator's
  * own ~6.5% standard error at m=256 — accuracy is pinned in
  * FunctionsSpec, portability by the q43/q75 oracles. */
object PortableSketches {

  // ───────────────────────────── portable HLL ─────────────────────────────

  /** Register-index bits: m = 256 buckets (first hex byte of the md5),
    * standard error 1.04/sqrt(256) ≈ 6.5%. */
  val HllP: Int = 8
  val HllM: Int = 1 << HllP
  /** w carries the next 14 hex chars = 56 bits; rho ∈ [1, 57]. */
  private val RhoMax = 57
  private val Pow2R = 1L << RhoMax // 2^57, the register-term scale

  /** alpha_m · m² · 2^57 — the raw-estimate numerator over the
    * 2^57-scaled integer harmonic sum. One double literal, shared with
    * the SQL side via [[hllEstimateSql]]. */
  private val HllA: Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / HllM)
    alpha * HllM.toDouble * HllM.toDouble * Pow2R.toDouble
  }
  private val LincountGate: Double = 2.5 * HllM // raw-vs-lincount switch
  private val LnM: Double = math.log(HllM.toDouble)
  private[graft] val Ln2 = 0.6931471805599453 // nearest double to ln 2
  private val Ln15 = 0.4054651081081644 // nearest double to ln 1.5
  private val SeriesC: Seq[Double] = Seq(3, 5, 7, 9, 11, 13).map(1.0 / _.toDouble)

  private def shl1(bits: Column): Column =
    call_function("shiftleft", lit(1L), bits)

  /** One md5 hex digest per row — project this ONCE and parse bucket
    * and rho from the column, so the row pays a single digest (bucket
    * and rho as independent `md5(value)` calls measured ~2× the md5
    * cost: the groupBy key and the aggregate input don't share
    * subexpressions across the aggregation boundary). */
  private[graft] def hllDigest(value: Column): Column =
    md5(value.cast("string"))

  /** bucket = first md5 hex byte; rho = leading-zero count of the next
    * 56 bits + 1 (via `bin` bit length — both engines print minimal
    * binary). Both parse an already-projected digest column. */
  private[graft] def hllBucket(digest: Column): Column =
    conv(substring(digest, 1, 2), 16, 10).cast("int")

  private[graft] def hllRho(digest: Column): Column = {
    val w = conv(substring(digest, 3, 14), 16, 10).cast("long")
    when(w === 0L, lit(RhoMax)).otherwise(lit(RhoMax) - length(bin(w)))
  }

  /** ln of a positive integer column (≤ ~2^30) with engine-identical
    * arithmetic: v = 2^k·f with k = bitlen−1, f ∈ [1,2);
    * ln v = k·ln2 + ln(1.5) + 2·atanh(z), z = (f−1.5)/(f+1.5),
    * |z| ≤ 0.2, atanh as a 7-term Horner in z². The SQL twin
    * ([[lnOfIntSql]]) spells the identical tree. */
  private[graft] def lnOfInt(v: Column): Column = {
    val k = (length(bin(v.cast("long"))) - 1).cast("int")
    val f = v.cast("double") / shl1(k).cast("double")
    val z = (f - lit(1.5)) / (f + lit(1.5))
    val z2 = z * z
    val horner = SeriesC.reverse.tail.foldLeft(lit(SeriesC.last): Column)(
      (acc, c) => lit(c) + z2 * acc)
    val s = z * (lit(1.0) + z2 * horner)
    k.cast("double") * lit(Ln2) + lit(Ln15) + lit(2.0) * s
  }

  /** Static JVM twin of [[lnOfInt]]: the IDENTICAL operation sequence
    * (bit-length range reduction, same Horner nesting, same literals)
    * as one function call, so results are bit-equal to the Column form
    * (FunctionsSpec proves it exhaustively over the small range and on
    * random longs). Exists because the Column macro substitutes its
    * argument ~30× — nest two of them (q110's Gumbel key: ln of a
    * mantissa that itself contains a ln) and the expression tree holds
    * ~900 md5/conv nodes, which measured ~8 s of pure
    * evaluate-the-tree overhead at x1 and grew with the corpus. The
    * [[PortableLn]] expression wraps this in codegen as a single
    * static call. */
  def lnOfPosLong(v: Long): Double = {
    // k mirrors length(bin(v)) - 1: v=0 → "0" (k=0); v<0 → 64-char
    // two's complement (k=63); v>0 → bitlen-1
    val k = if (v == 0L) 0 else 63 - java.lang.Long.numberOfLeadingZeros(v)
    val f = v.toDouble / (1L << k).toDouble
    val z = (f - 1.5) / (f + 1.5)
    val z2 = z * z
    var acc = SeriesC.last
    var i = SeriesC.length - 2
    while (i >= 0) { acc = SeriesC(i) + z2 * acc; i -= 1 }
    val s = z * (1.0 + z2 * acc)
    k.toDouble * Ln2 + Ln15 + 2.0 * s
  }

  /** [[lnOfInt]] as a compiled single-node expression — same bits,
    * constant-size plan. Use this form on per-row streams; the Column
    * macro remains for the tiny bucket-table projections where it
    * started. */
  private[graft] def lnOfIntFast(v: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(PortableLn(GraftSqlShim.expression(v.cast("long"))))
  }

  private[graft] def lnOfIntSql(v: String): String = {
    val k = s"(len(bin(CAST($v AS BIGINT))) - 1)"
    val f = s"(CAST($v AS DOUBLE) / CAST((1::BIGINT << $k) AS DOUBLE))"
    val z = s"(($f - 1.5) / ($f + 1.5))"
    val z2 = s"($z * $z)"
    val horner = SeriesC.reverse.tail.foldLeft(SeriesC.last.toString)(
      (acc, c) => s"($c + $z2 * $acc)")
    val s0 = s"($z * (1.0 + $z2 * $horner))"
    s"(CAST($k AS DOUBLE) * $Ln2 + $Ln15 + 2.0 * $s0)"
  }

  /** Estimate column from per-group register aggregates: `zsum` =
    * Σ 2^(57−r) over PRESENT registers (exact DECIMAL), `present` =
    * their count. Absent registers contribute 2^57 each; the raw
    * estimate is A / Z, switched to linear counting m·ln(m/V) below
    * the standard 2.5m gate. Branch condition and both branch values
    * are engine-identical doubles. */
  private[graft] def hllRegisterTerm(r: Column): Column =
    shl1(lit(RhoMax) - r).cast("decimal(20,0)")

  private[graft] def hllEstimate(zsum: Column, present: Column): Column = {
    val vZero = (lit(HllM.toLong) - present).cast("long")
    val z = zsum + vZero.cast("decimal(4,0)") * lit(Pow2R).cast("decimal(18,0)")
    val eRaw = lit(HllA) / z.cast("double")
    when(eRaw <= lit(LincountGate) && vZero > 0L,
      lit(HllM.toDouble) * (lit(LnM) - lnOfInt(vZero)))
      .otherwise(eRaw)
  }

  /** The SQL twins, over an already-projected digest column (mirror
    * the one-digest-per-row shape); the register/estimate fragments
    * mirror [[hllRegisterTerm]]/[[hllEstimate]] over columns named
    * bucket/r/zsum/present. */
  private[graft] def hllDigestSql(v: String): String =
    s"md5(CAST($v AS VARCHAR))"

  private[graft] def hllBucketSql(digest: String): String =
    s"('0x' || substr($digest, 1, 2))::INT"

  private[graft] def hllRhoSql(digest: String): String = {
    val w = s"('0x' || substr($digest, 3, 14))::BIGINT"
    s"(CASE WHEN $w = 0 THEN $RhoMax ELSE $RhoMax - len(bin($w)) END)"
  }

  private[graft] val hllRegisterTermSql: String =
    s"CAST((1::BIGINT << ($RhoMax - r)) AS DECIMAL(20,0))"

  private[graft] def hllEstimateSql(zsum: String, present: String): String = {
    val vZero = s"(${HllM}::BIGINT - $present)"
    // exact integer arithmetic; DuckDB does it in HUGEINT (its DECIMAL
    // multiply caps at the operand width), Spark in DECIMAL — only the
    // VALUE must match, and both cast the exact integer to DOUBLE once
    val z = s"(CAST($zsum AS HUGEINT) + CAST($vZero AS HUGEINT) * ${Pow2R}::HUGEINT)"
    val eRaw = s"($HllA / CAST($z AS DOUBLE))"
    s"(CASE WHEN $eRaw <= $LincountGate AND $vZero > 0 " +
      s"THEN ${HllM.toDouble} * ($LnM - ${lnOfIntSql(vZero)}) ELSE $eRaw END)"
  }

  // ───────────────────────────── portable CMS ─────────────────────────────

  /** depth 4 × width 1024: ε = e/1024 ≈ 0.27% of the stream per lane,
    * overcount prob per point query ≈ (1/e)^4 < 2%. All four lane
    * hashes slice ONE md5 of the value — hex chars [8i+1, 8i+8] (the
    * 128-bit digest is exactly 4 × 32-bit lanes, pairwise independent
    * the way a 4-seed family is) — so a row pays a single digest, and
    * everything downstream is pure integers: estimates are
    * exact-matchable with no FP caveats at all. (The first cut hashed
    * "value#lane" per lane — 4 digests/row, measured 2× on q90.) */
  val CmsDepth: Int = 4
  val CmsWidth: Int = 1024

  /** All-lane (lane, bucket) array for one value — posexplode to rows. */
  private[graft] def cmsBuckets(value: Column): Column = {
    val d = md5(value.cast("string"))
    array((0 until CmsDepth).map(i =>
      conv(substring(d, 8 * i + 1, 8), 16, 10).cast("long") % CmsWidth): _*)
  }

  private[graft] def cmsBucketSql(v: String, lane: Int): String =
    s"(('0x' || substr(md5(CAST($v AS VARCHAR)), ${8 * lane + 1}, 8))::BIGINT % $CmsWidth)"

  /** The constant lane buckets of a LITERAL key — precomputed JVM-side
    * (same md5), inlined in both engines' point-query expressions. */
  def cmsKeyBuckets(key: String): Seq[Long] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0 until CmsDepth).map { i =>
      java.lang.Long.parseLong(hex.substring(8 * i, 8 * i + 8), 16) % CmsWidth
    }
  }
}

/** [[PortableSketches.lnOfInt]] as ONE compiled expression node: the
  * generated code is a single static call to
  * [[PortableSketches.lnOfPosLong]], bit-identical to the Column-macro
  * form (same literals, same nesting — differentially spec-tested).
  * The macro form substitutes its argument tree ~30×, so any NESTED
  * use (ln of something containing a ln, as in the Gumbel key) blows
  * the plan up combinatorially; this node keeps it constant-size and
  * inside whole-stage codegen. */
case class PortableLn(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def prettyName: String = "graft_portable_ln"
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = DoubleType

  protected override def nullSafeEval(input: Any): Any =
    PortableSketches.lnOfPosLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableSketches.lnOfPosLong($c)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): PortableLn =
    copy(child = newChild)
}
