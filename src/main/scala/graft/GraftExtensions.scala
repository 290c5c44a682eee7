package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.{CosineSimilarity, DotProduct, Hash60, NormalizeNFC, ShingleGenerator, ZOrderKey}

/** SQL-surface registration of the engine's custom Catalyst
  * expressions (`SparkSessionExtensions.injectFunction`), so
  * `spark.sql(...)` users get the same codegen'd kernels the
  * DataFrame API uses:
  *
  *  - `hash60(text)`           — portable 60-bit md5 content hash
  *  - `shingles(text, n)`      — word n-gram generator (n a literal)
  *  - `vec_dot(a, b)`          — Σ aᵢ·bᵢ over array<double>
  *  - `vec_cosine(a, b)`       — cosine similarity over array<double>
  *  - `zorder_key(x, y)`       — Morton clustering key (low 31 bits each)
  *
  * Apply with `SparkSession.builder.withExtensions(GraftExtensions)`
  * (Sessions.local does) or
  * `spark.sql.extensions=graft.GraftExtensions` in a cluster submit
  * conf — the standard deployment path for engine extensions.
  */
object GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def one(name: String, build: Expression => Expression)(
      args: Seq[Expression]): Expression = {
    require(args.length == 1, s"$name expects exactly 1 argument")
    build(args.head)
  }
  private def two(name: String, build: (Expression, Expression) => Expression)(
      args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$name expects exactly 2 arguments")
    build(args.head, args(1))
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("hash60"),
      new ExpressionInfo(classOf[Hash60].getName, "hash60"),
      one("hash60", Hash60.apply) _))
    e.injectFunction((FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShingleGenerator].getName, "shingles"),
      (args: Seq[Expression]) => args match {
        // n shapes the generator's output arity, so it must be a
        // literal — same constraint the DataFrame API enforces by
        // taking n: Int.
        case Seq(t, Literal(n: Int, IntegerType)) => ShingleGenerator(t, n)
        case _ => throw new IllegalArgumentException(
          "shingles(text, n) requires an integer LITERAL n")
      }))
    e.injectFunction((FunctionIdentifier("nfc"),
      new ExpressionInfo(classOf[NormalizeNFC].getName, "nfc"),
      one("nfc", NormalizeNFC.apply) _))
    e.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      two("vec_dot", DotProduct.apply) _))
    e.injectFunction((FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "vec_cosine"),
      two("vec_cosine", CosineSimilarity.apply) _))
    e.injectFunction((FunctionIdentifier("zorder_key"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "zorder_key"),
      two("zorder_key", ZOrderKey.apply) _))
  }
}
