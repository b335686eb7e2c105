package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native DotProduct expression: SQL registration, codegen/interpreted
  * agreement, null handling, and equivalence with the HOF formulation it
  * replaced (same left-fold order ⇒ bit-identical doubles). */
class DotProductSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("registered in SQL via GraftExtensions") {
    val d = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(d == 11.0)
  }

  test("null inputs propagate null") {
    val r = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d").collect()(0)
    assert(r.isNullAt(0))
  }

  test("rejects non-array inputs at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(1.0d, 2.0d)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_dot") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("bit-identical to the higher-order-function left fold on real vectors") {
    val vecs = Seq.tabulate(64)(i => math.sin(i * 2.147) * (if (i % 3 == 0) -1 else 1))
    val other = Seq.tabulate(64)(i => math.cos(i * 1.618) * 3.7)
    val df = Seq((vecs, other)).toDF("a", "b")
    val native = df.select(call_function("graft_dot", col("a"), col("b"))).collect()(0).getDouble(0)
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    ).collect()(0).getDouble(0)
    assert(native == hof) // exact, not approximate: same fold order
  }

  test("length mismatch raises (DuckDB list_inner_product parity), both eval paths") {
    // interpreted
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d)) AS d").collect()
    }
    assert(e.getMessage.contains("lengths differ") ||
      Option(e.getCause).exists(_.getMessage.contains("lengths differ")))
    // codegen over a real column (literal folding bypassed)
    val df = Seq((Seq(1.0, 2.0), Seq(3.0))).toDF("a", "b")
    val e2 = intercept[Exception] {
      df.select(call_function("graft_dot", col("a"), col("b"))).collect()
    }
    assert(e2.getMessage.contains("lengths differ") ||
      Option(e2.getCause).exists(_.getMessage.contains("lengths differ")))
  }

  test("null elements poison to null and the expression declares itself nullable") {
    val df = Seq((Seq(Some(1.0), None), Seq(Some(2.0), Some(3.0)))).toDF("a", "b")
    val out = df.select(call_function("graft_dot", col("a"), col("b")).as("d"))
    assert(out.schema("d").nullable, "nullable must cover element-null poisoning")
    assert(out.collect()(0).isNullAt(0))
  }

  test("interpreted eval agrees with codegen path") {
    val e = graft.functions.DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.5, -2.0, 3.25), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2.0, 0.5, -4.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == (1.5 * 2.0 + -2.0 * 0.5 + 3.25 * -4.0))
  }
}
