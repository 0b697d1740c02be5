package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.vector.FloatVecDot

/** SparkSessionExtensions entry point: makes the engine's Catalyst
  * expressions available to any session built with
  * `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.GraftExtensions` — the injection path
  * the Spark guide prescribes for engine-level function surface
  * (per-session registration stays available in [[GraftFunctions]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_dot"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_chunk_recursive"),
      new ExpressionInfo(
        classOf[graft.text.chunk.RecursiveChunkGenerator].getName,
        "graft_chunk_recursive"),
      (exprs: Seq[Expression]) =>
        graft.text.chunk.RecursiveChunkGenerator(exprs)))
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    e.injectOptimizerRule(_ => graft.plans.RewriteTopKWindow)
  }
}
