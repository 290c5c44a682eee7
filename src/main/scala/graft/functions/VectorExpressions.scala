package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math over `array<float>` /
  * `array<double>` columns, with whole-stage codegen (`doGenCode`).
  *
  * Rationale: the composable formulation —
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is correct but Spark's
  * higher-order array functions are CodegenFallback: every row pays
  * interpreted lambda dispatch and a materialized intermediate array.
  * These expressions generate a tight primitive loop instead (no
  * boxing, no intermediates) and keep the surrounding stage in
  * whole-stage codegen. Accumulation order is the same sequential
  * index-order fold, so results are bit-identical to the composable
  * form and to the DuckDB oracle.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // Mismatched lengths or a null element yield NULL (matching the
  // zip_with/aggregate composable form, which null-pads), never a
  // silently truncated fold over the common prefix.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"${getClass.getSimpleName} expects array<float|double> inputs, " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")
    }

  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"${getClass.getSimpleName} expects array<float|double>, got $t")
  }

  private def elemsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  /** (dot, normLeftSq, normRightSq) → result. */
  protected def finish(dot: Double, nx: Double, ny: Double): Double
  /** Java source: expression over generated vars (d, x2, y2). */
  protected def finishCode(d: String, x2: String, y2: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val checkNulls = elemsNullable
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    finish(dot, nx, ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val d = ctx.freshName("dot"); val x2 = ctx.freshName("nx")
      val y2 = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val getX = if (elemIsFloat(left)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getY = if (elemIsFloat(right)) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      val nullCheck =
        if (elemsNullable)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $x.numElements();
         |  double $d = 0.0, $x2 = 0.0, $y2 = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    final double $xi = $getX;
         |    final double $yi = $getY;
         |    $d += $xi * $yi; $x2 += $xi * $xi; $y2 += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = ${finishCode(d, x2, y2)};
         |  }
         |}
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ in index order. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override protected def finish(dot: Double, nx: Double, ny: Double): Double = dot
  override protected def finishCode(d: String, x2: String, y2: String): String = d
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** dot / (‖a‖·‖b‖), matching `list_dot_product(a,b) /
  * (sqrt(list_dot_product(a,a)) * sqrt(list_dot_product(b,b)))`.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorFold {
  override protected def finish(dot: Double, nx: Double, ny: Double): Double =
    dot / (math.sqrt(nx) * math.sqrt(ny))
  override protected def finishCode(d: String, x2: String, y2: String): String =
    s"$d / (java.lang.Math.sqrt($x2) * java.lang.Math.sqrt($y2))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorExpressions {
  def dot_product(a: Column, b: Column): Column =
    Cols.column(DotProduct(Cols.expression(a), Cols.expression(b)))
  def cosine_sim(a: Column, b: Column): Column =
    Cols.column(CosineSimilarity(Cols.expression(a), Cols.expression(b)))
}
