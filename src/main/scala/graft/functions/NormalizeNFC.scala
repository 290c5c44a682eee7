package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object NormalizeNFCImpl {
  /** Unicode NFC (canonical composition): "e"+U+0301 → "é". The
    * fast-path check avoids the String round-trip for already-composed
    * text (virtually all real corpora), so the common case is a scan +
    * boolean test. Matches DuckDB's `nfc_normalize`.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Native NFC normalization expression — Spark has no built-in Unicode
  * normalizer, and a Scala UDF here would break whole-stage codegen in
  * the text-pipeline hot path (normalization runs before EVERY dedup
  * hash — un-normalized equal texts hash differently and defeat exact
  * dedup).
  */
case class NormalizeNFC(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc expects a string column, got ${t.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    NormalizeNFCImpl.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNFCImpl.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNFC =
    copy(child = newChild)
}

object NormalizeNFC {
  def nfc(c: Column): Column = Cols.column(NormalizeNFC(Cols.expression(c)))
}
