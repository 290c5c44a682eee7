package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object Hash60Impl {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(utf8 bytes) — numerically identical to
    * `conv(substring(md5(x), 1, 15), 16, 10)` (15 hex nibbles) and to
    * DuckDB's `('0x'||substr(md5(x),1,15))::BIGINT`, without the hex
    * string round-trip or per-call digest allocation.
    */
  def hash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }
}

/** Native 60-bit portable content hash (see TextOps.hash60 for the
  * composable formulation this replaces in hot paths — minhash computes
  * it ~16× per shingle).
  */
case class Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  // Fail at analysis, not mid-job: a non-string child would otherwise
  // surface as a codegen ClassCastException on the first row.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hash60 expects a string column, got ${t.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Hash60Impl.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60Impl.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  def hash60(c: Column): Column = Cols.column(Hash60(Cols.expression(c)))
}
