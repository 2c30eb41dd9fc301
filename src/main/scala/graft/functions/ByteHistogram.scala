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
