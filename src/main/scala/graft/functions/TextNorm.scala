package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC composition as a codegen-friendly static call —
  * Spark ships no normalization builtin, and a Scala UDF would drop
  * the surrounding projection out of whole-stage codegen. DuckDB's
  * `nfc_normalize` (utf8proc) implements the same Unicode algorithm,
  * so the oracle replays it exactly. */
object TextNorm {
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))
}

/** `graft_nfc(string)` — single compiled node, one static call per row
  * (the PortableLn pattern). */
case class NfcNormalize(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def prettyName: String = "graft_nfc"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  protected override def nullSafeEval(input: Any): Any =
    TextNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfc($c)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): NfcNormalize =
    copy(child = newChild)
}
