package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimilarity

/** Session extensions registering graft's native Catalyst functions, so
  * they're callable from SQL text (the config surface's single SELECT)
  * and via `functions.call_function`:
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.sql.GraftExtensions")
  *
  * Currently: `cosine_sim(array, array)` — codegen'd cosine similarity
  * ([[graft.functions.CosineSimilarity]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.cosineSimEntry)
}

object GraftExtensions {
  private val cosineSimEntry = (
    new FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"cosine_sim expects 2 arguments, got ${children.size}")
      CosineSimilarity(children.head, children(1))
    })

  /** Imperative registration into an existing session (idempotent) — for
    * callers that didn't configure spark.sql.extensions. */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      cosineSimEntry._1, cosineSimEntry._2, cosineSimEntry._3)
}
