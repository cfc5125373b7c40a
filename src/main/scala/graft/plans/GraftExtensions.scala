package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductExpr, MinHashSignatureExpr, QuantizeInt8StatsExpr, RepetitionStatsExpr, SimHash64Expr, WordShinglesExpr}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so the pure-SQL surface (`spark.sql`)
  * reaches them too:
  *
  *   spark.sql("SELECT dot_product(a, b) FROM vectors")
  *
  * Activate with `.withExtensions(new GraftExtensions)` on the builder or
  * `spark.sql.extensions=graft.plans.GraftExtensions` in config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.functions

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  // The native expressions assume their exact input types (the Column API
  // inserts casts); the SQL path must too, or array<float> inputs — like
  // the embeddings table — would read garbage through getDouble.
  private def dblArr(e: Expression): Expression = Cast(e, ArrayType(DoubleType))
  private def strArr(e: Expression): Expression = Cast(e, ArrayType(StringType))

  /** name → expression builder, shared by both registration paths. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> ((args: Seq[Expression]) =>
      DotProductExpr(dblArr(args(0)), dblArr(args(1)))),
    "minhash_signature" -> ((args: Seq[Expression]) =>
      MinHashSignatureExpr(strArr(args(0)), intLit(args(1), "minhash k"))),
    "simhash64" -> ((args: Seq[Expression]) => SimHash64Expr(strArr(args(0)))),
    "quantize_int8_stats" -> ((args: Seq[Expression]) =>
      QuantizeInt8StatsExpr(dblArr(args(0)))),
    "word_shingles" -> ((args: Seq[Expression]) =>
      WordShinglesExpr(strArr(args(0)), intLit(args(1), "shingle n"))),
    "repetition_stats" -> ((args: Seq[Expression]) =>
      RepetitionStatsExpr(strArr(args(0)))))

  /** Register the same functions in an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, name, builder)
    }
}
