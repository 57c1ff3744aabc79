package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/**
 * Session extension registering the engine's custom expressions as SQL
 * functions, so `spark.sql("... dot_product(a, b) ...")` and domain
 * Resolution SQL can call them. Install cluster-wide with
 * `--conf spark.sql.extensions=graft.functions.GraftExtensions`, or on a
 * live session via [[GraftExtensions.register]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injectables.foreach(ext.injectFunction)
}

object GraftExtensions {
  private val injectables
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(arrayA, arrayB) takes 2 arguments")
        DotProduct(args.head, args(1))
      }), (
      FunctionIdentifier("hashed_bow_embedding"),
      new ExpressionInfo(classOf[HashedBowEmbeddingMilli].getName,
        "hashed_bow_embedding"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "hashed_bow_embedding(tokens, d) takes 2 arguments")
        val d = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"hashed_bow_embedding: d must be an integer literal, got $other")
        }
        HashedBowEmbeddingMilli(args.head, d)
      }))

  /** Register the functions on an already-built session (tests, REPLs). */
  def register(spark: SparkSession): Unit =
    injectables.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
