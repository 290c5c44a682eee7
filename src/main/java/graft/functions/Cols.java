package graft.functions;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.classic.ExpressionUtils;

/**
 * Column &lt;-&gt; Expression bridge. ExpressionUtils is public bytecode but
 * carries a Scala private[sql] signature; Java linkage (which only sees
 * the bytecode) is the supported-JVM-level way to reach it without
 * placing code in Spark's package namespace.
 */
public final class Cols {
  private Cols() {}

  public static Column column(Expression e) {
    return ExpressionUtils.column(e);
  }

  public static Expression expression(Column c) {
    return ExpressionUtils.expression(c);
  }
}
