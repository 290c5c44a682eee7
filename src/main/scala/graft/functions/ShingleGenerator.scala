package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator`: word n-gram shingles straight from the
  * text column in one pass — `shingles("a b c d", 3)` emits rows
  * "a b c", "b c d".
  *
  * Replaces the three-operator chain tokenize → posexplode → windowed
  * LEAD/concat (which costs a per-document shuffle + sort for the
  * window) and the higher-order-function formulation (interpreted per
  * shingle). A generator needs no shuffle at all: rows stream out of
  * the scan partition-locally.
  */
case class ShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("sh", StringType, nullable = false) :: Nil)

  // Fail at analysis, not mid-job, for a non-string child.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingles expects a string column, got ${t.sql}")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val s = v.asInstanceOf[UTF8String].toString
    // Whitespace tokenization identical to Spark's split(text, "\\s+")
    // and DuckDB's string_split_regex: limit -1 keeps boundary empties.
    val toks = s.split("\\s+", -1)
    if (toks.length < n) Iterator.empty
    else new Iterator[InternalRow] {
      private var i = 0
      private val last = toks.length - n
      private val sb = new java.lang.StringBuilder
      override def hasNext: Boolean = i <= last
      override def next(): InternalRow = {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k)); k += 1
        }
        i += 1
        InternalRow(UTF8String.fromString(sb.toString))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}

object ShingleGenerator {
  def shingles(text: Column, n: Int): Column =
    Cols.column(ShingleGenerator(Cols.expression(text), n))
}
