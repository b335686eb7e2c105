package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions: registers graft's native expressions with the
  * session's function registry, making them first-class in both the
  * Column API (`call_function("graft_dot", ...)`) and SQL
  * (`SELECT graft_dot(a, b)`). Installed by Engine via
  * `spark.sql.extensions`, so every entry point (Verify, Bench, tests)
  * gets them without per-call registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
  }
}
