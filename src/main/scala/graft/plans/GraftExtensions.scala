package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.CosineSimilarity

/** SparkSessionExtensions entry point for the engine's native Catalyst
  * surface — activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (set by
  * GraftSession/Verify/Bench builders).
  *
  * Currently injects:
  *   - `graft_cosine(array<double>, array<double>) -> double` —
  *     whole-stage-codegen cosine similarity ([[CosineSimilarity]]),
  *     callable from SQL text and via `functions.call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_cosine takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
  }
}
