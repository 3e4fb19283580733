package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the custom codegen
  * expressions as SQL functions so `spark.sql("... graft_dot(a, b)
  * ...")` works alongside the Column API.
  *
  * Activate with either
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` (the
  * config route is what a cluster deployment uses).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteDotProductRule)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (children: Seq[Expression]) =>
        DotProductExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSizeExpr].getName,
        "graft_sorted_intersect_size"),
      (children: Seq[Expression]) =>
        SortedIntersectSizeExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_shingles"),
      new ExpressionInfo(classOf[SortedShinglesExpr].getName,
        "graft_sorted_shingles"),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"shingle size must be a literal, got $other")
        }
        SortedShinglesExpr(children(0), n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_normalize_text"),
      new ExpressionInfo(classOf[NormalizeTextExpr].getName,
        "graft_normalize_text"),
      (children: Seq[Expression]) => NormalizeTextExpr(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_jump_shard"),
      new ExpressionInfo(classOf[JumpHashExpr].getName,
        "graft_jump_shard"),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"shard count must be a literal, got $other")
        }
        JumpHashExpr(children(0), n)
      }))
  }
}
