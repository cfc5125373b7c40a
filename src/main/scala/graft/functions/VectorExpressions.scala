package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** I2 upgrade path (SURVEY.md §4): a native Catalyst expression with
  * `doGenCode` for the vector dot product — the one hot-loop where Spark's
  * built-ins genuinely fall short: higher-order functions
  * (`zip_with`/`aggregate`) do not participate in whole-stage codegen and
  * evaluate one boxed lambda call per element. This generates a tight
  * primitive `double` loop instead, keeping million-vector cosine scans
  * (K3 similarity search, K2 embedding near-dup) fully codegen'd.
  *
  * Semantics match [[VectorFunctions.dot]]: element-wise product summed
  * left-to-right in double; null input (either side) ⇒ null; arrays are
  * consumed up to the shorter length.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<double>; the Column API below inserts the
  // cast (AbstractDataType/ImplicitCastInputTypes are private[sql]).
  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level API over the codegen'd expressions. */
object VectorExpressions {

  private def asDoubleArray(c: Column): Expression =
    GraftSqlBridge.expression(c.cast(ArrayType(DoubleType)))

  /** Codegen'd dot product of two numeric-array columns. */
  def dotFast(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductExpr(asDoubleArray(a), asDoubleArray(b)))

  /** Codegen'd cosine similarity (three dot products, one pass each). */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotFast(a, b) / (sqrt(dotFast(a, a)) * sqrt(dotFast(b, b)))
  }
}
