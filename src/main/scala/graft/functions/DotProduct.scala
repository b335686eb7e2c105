package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two double arrays with whole-stage codegen.
  *
  * This replaces `aggregate(zip_with(a, b, _*_), 0.0, _+_)` in the
  * similarity kernels: the higher-order-function version allocates an
  * intermediate array and interprets a lambda per element, falling out
  * of codegen in the hottest loop the engine has (every candidate pair
  * evaluates it). Here the loop compiles straight into the generated
  * stage: no allocation, no virtual calls.
  *
  * Semantics are kept bit-identical to the HOF version and to DuckDB's
  * `list_inner_product` (the oracle): a strict left-to-right fold of
  * `acc + x_i * y_i` in IEEE doubles, so scores and rankings agree across
  * engines without tolerance. A length mismatch raises (DuckDB's
  * `list_inner_product` errors on unequal lengths; silently truncating
  * would be a latent engine/oracle divergence), and a null element
  * poisons the result to null in both the interpreted and codegen paths.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two array<double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  })

  /** Null-element poisoning makes the result null even when both array
    * inputs are non-null, so nullability must account for the element
    * flag too — without this override the codegen null-branch would
    * assign to a literal `false` and fall back to interpreted eval. */
  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: array lengths differ (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null element poisons the product, matching the HOF fold and
      // DuckDB's list_inner_product — never silently read null as 0.0
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      // element null checks are only generated when the input type allows
      // null elements — the hot path over non-null arrays stays branch-free
      val nullCheck = if (elementsNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: array lengths differ (" + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
