package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers every graft native
  * function at session-build time, the deployment-grade alternative to
  * the imperative `register(s)` calls the ops make (kept for caller
  * sessions built without extensions — both paths resolve to the same
  * Expression classes).
  *
  * Use: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SqDist].getName, "graft_sqdist"),
      (args: Seq[Expression]) => SqDist(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_bands"),
      new ExpressionInfo(classOf[HyperplaneBands].getName, "graft_hyperplane_bands"),
      (args: Seq[Expression]) => HyperplaneBands(args)))
    ext.injectFunction((
      FunctionIdentifier("graft_nearest_cells"),
      new ExpressionInfo(classOf[NearestCells].getName, "graft_nearest_cells"),
      (args: Seq[Expression]) => NearestCells.builder(args)))
    ext.injectFunction((
      FunctionIdentifier("graft_chunk_split"),
      new ExpressionInfo(classOf[ChunkSplit].getName, "graft_chunk_split"),
      (args: Seq[Expression]) => ChunkSplit(args(0), args(1), args(2))))
    // algebraic identities over the native functions (see SelfDistanceFold)
    ext.injectOptimizerRule(_ => SelfDistanceFold)
  }
}
