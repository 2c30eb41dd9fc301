package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local gram hashing + winnowing anchor selection for the
  * duplicated-span miners ([[graft.ops.Dedup.duplicatedSpans]] /
  * `duplicatedSpansWinnowed`), as ONE compiled expression.
  *
  * Why this exists: the original formulation composed builtin array
  * HOFs — `transform(sequence(...), p => md5(substr(...)))` for the
  * digests and a nested `transform(…, aggregate(…))` for the
  * per-window argmin. Spark's higher-order functions are
  * CodegenFallback: every lambda application is an interpreted
  * expression-tree walk with per-element allocation, and the nested
  * argmin paid it window× per gram. Measured on the x100 scaling
  * corpus this made the WINNOWED miner (4.2/37.7/284.7 s at
  * x1/x10/x100) slower than the exact stride-1 miner it is supposed to
  * undercut (2.8/15.9/208.7 s) — the shuffled stream did shrink
  * ~window×, but the interpreted selection dominated. This expression
  * runs the whole per-document pipeline as tight JVM loops (one
  * reusable MessageDigest, byte-level gram slicing on the ASCII fast
  * path, an O(n) monotonic-deque sliding argmin instead of the
  * O(n·window) rescan) and returns the slim (pos, h1, h2) structs the
  * miners shuffle.
  *
  * Bit-compatibility contract (the differential oracles depend on it):
  *   - digests are md5 over the UTF-8 bytes of the spanLen-CHARACTER
  *     substring — identical to `md5(substr(text, p, spanLen))`;
  *   - (h1, h2) are the two big-endian signed-64 halves of the digest,
  *     identical to a `conv(substring(hex, …), 16, 10)` +
  *     shift-left/OR recombination of the 8-hex-char halves (each
  *     parses below 2^32, so the unsigned<<32|unsigned bit pattern IS
  *     the big-endian long — the [[graft.ops.Dedup.portableHash64]]
  *     recipe, and what the oracles' '0x'||substr casts compute);
  *   - winnowing (window ≥ 1) selects the argmin digest of EVERY
  *     window of `window` consecutive grams, lexicographic on the hex
  *     string = unsigned-byte order on the digest, LEFTMOST on ties
  *     (the deque evicts only strictly-greater back entries, so the
  *     front stays the earliest minimum), `window` clamped to the gram
  *     count so short documents winnow over one whole-document window,
  *     selected positions deduplicated (they emerge non-decreasing, so
  *     adjacent-dedup is total dedup);
  *   - window = 0 emits every gram (the exact stride-1 miner shares
  *     the hashing loop).
  */
case class GramAnchors(child: Expression, spanLen: Int, window: Int)
  extends UnaryExpression {

  require(spanLen >= 1, s"spanLen must be positive, got $spanLen")
  require(window >= 0, s"window must be >= 0, got $window")

  override def prettyName: String = "graft_gram_anchors"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val nChars = s.codePointCount(0, s.length)
    val n = nChars - spanLen + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val bytes = text.getBytes
    val ascii = bytes.length == s.length // 1 byte per char -> offsets align
    val digests = new Array[Array[Byte]](n)
    var p = 0
    while (p < n) {
      if (ascii) md.update(bytes, p, spanLen)
      else {
        // codepoint-correct slow path (matches substr semantics)
        val st = s.offsetByCodePoints(0, p)
        val en = s.offsetByCodePoints(st, spanLen)
        md.update(s.substring(st, en).getBytes("UTF-8"))
      }
      digests(p) = md.digest()
      p += 1
    }
    val sel: Array[Int] =
      if (window == 0) Array.tabulate(n)(identity)
      else {
        val w = math.min(window, n)
        val deque = new Array[Int](n)
        var head = 0
        var tail = 0 // exclusive
        val out = new Array[Int](n)
        var outN = 0
        var e = 0
        while (e < n) {
          while (tail > head && lessThan(digests(e), digests(deque(tail - 1))))
            tail -= 1
          deque(tail) = e
          tail += 1
          if (deque(head) <= e - w) head += 1
          if (e >= w - 1) {
            val cand = deque(head)
            if (outN == 0 || out(outN - 1) != cand) {
              out(outN) = cand
              outN += 1
            }
          }
          e += 1
        }
        java.util.Arrays.copyOf(out, outN)
      }
    val rows = new Array[Any](sel.length)
    var i = 0
    while (i < sel.length) {
      val idx = sel(i)
      val bb = ByteBuffer.wrap(digests(idx))
      rows(i) = InternalRow((idx + 1).toLong, bb.getLong(0), bb.getLong(8))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("gramAnchors", this, classOf[GramAnchors].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramAnchors =
    copy(child = newChild)
}

object GramAnchors {
  /** Column API: (pos, h1, h2) structs of every gram (window = 0) or
    * of the winnowed anchor grams (window ≥ 1). */
  def grams(text: Column, spanLen: Int, window: Int): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(GramAnchors(GraftSqlShim.expression(text), spanLen, window))
  }
}
