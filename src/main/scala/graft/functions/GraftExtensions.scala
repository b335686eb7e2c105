package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

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
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopK].getName, "graft_topk"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_topk takes exactly 2 arguments")
        TopK(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_pq_encode takes exactly 2 arguments")
        PqEncode(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_adc"),
      new ExpressionInfo(classOf[AdcSum].getName, "graft_adc"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_adc takes exactly 2 arguments")
        AdcSum(children.head, children(1))
      }))
    // Spark ships BloomFilterAggregate/BloomFilterMightContain as INTERNAL
    // expressions (the machinery behind AQE's runtime bloom-join
    // injection) without registering them as callable functions. Surface
    // them under their upstream SQL names so d14's prefilter builds the
    // filter as a distributed aggregation and probes it codegen-side —
    // no driver-built sketch, no per-row UDF.
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_filter_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => new BloomFilterAggregate(c)
        case Seq(c, n) => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg takes 1 to 3 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "might_contain takes exactly 2 arguments")
        BloomFilterMightContain(children.head, children(1))
      }))
  }
}
