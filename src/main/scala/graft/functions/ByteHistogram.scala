package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** 16-bin histogram of the high nibbles of a binary column — a cheap,
  * deterministic content signature for opaque media payloads (the shape
  * a real feature extractor produces: binary in, fixed-width vector
  * out). One compiled loop per row via doGenCode, like the signature
  * expressions. */
case class ByteHistogram(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "graft_byte_histogram"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got ${child.dataType}")

  def compute(bytes: Array[Byte]): GenericArrayData = {
    val bins = new Array[Int](16)
    var i = 0
    while (i < bytes.length) {
      bins((bytes(i) >> 4) & 0xF) += 1
      i += 1
    }
    new GenericArrayData(bins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("byteHistogram", this, classOf[ByteHistogram].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
}

object ByteHistogram {
  def of(bytes: Column): Column =
    GraftSqlShim.column(ByteHistogram(GraftSqlShim.expression(bytes)))
}

/** Hashed byte-4-gram frequency signature of a binary column — the
  * whole bag-of-local-patterns accumulation of
  * [[graft.ops.Multimodal.byteGramSignature]] as ONE compiled loop per
  * row: non-overlapping 4-byte windows read big-endian, binned by the
  * Knuth multiplicative hash `bin = ((v·2654435761 mod 2^32)·bins) >>
  * 32`, counted into a dense float array. Replaces the
  * hex→transform→explode→groupBy formulation, which paid an
  * interpreted HOF lambda per window, a 2× hex string per payload, an
  * 8-char substring + string conv per window, AND a (media_id, bin)
  * exchange — measured ~same cost as the md5 recipe it was meant to
  * beat (round 12; the digest was never the whole tax). Here: zero
  * allocations per window, zero shuffle, whole-stage-codegen'd via
  * doGenCode. Counts are small integers (exact in float), so
  * downstream double cosines stay bit-identical to an oracle
  * recomputing from raw counts — the bin arithmetic is the same pure
  * integer recipe the DuckDB twin replays. */
case class ByteGramSignature(child: Expression, bins: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(bins >= 2 && bins <= (1 << 20), s"bins must be in [2, 2^20]: $bins")

  override def prettyName: String = "graft_byte_gram_signature"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got ${child.dataType}")

  def compute(bytes: Array[Byte]): GenericArrayData = {
    val counts = new Array[Float](bins)
    val nw = bytes.length / 4
    var k = 0
    while (k < nw) {
      val i = k * 4
      val v = ((bytes(i) & 0xFFL) << 24) | ((bytes(i + 1) & 0xFFL) << 16) |
        ((bytes(i + 2) & 0xFFL) << 8) | (bytes(i + 3) & 0xFFL)
      val h = (v * 2654435761L) & 0xFFFFFFFFL
      counts(((h * bins) >>> 32).toInt) += 1.0f
      k += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("byteGramSig", this, classOf[ByteGramSignature].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteGramSignature =
    copy(child = newChild)
}

object ByteGramSignature {
  def of(bytes: Column, bins: Int): Column =
    GraftSqlShim.column(ByteGramSignature(GraftSqlShim.expression(bytes), bins))
}
