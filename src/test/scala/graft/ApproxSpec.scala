package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sources
import graft.ops.Relational

/** Error-bound pins for the approximate aggregates (x5). The gate can't
  * hash-compare sketch outputs across engines (HLL++/t-digest internals
  * are engine-specific), so the quality claim is asserted here instead:
  * each sketch lands within its declared error of the exact aggregate,
  * and the whole entry is deterministic run-to-run (Spark's sketches are
  * deterministic for a fixed input partitioning — no seed involved).
  */
class ApproxSpec extends AnyFunSuite {
  import TestSpark._

  test("x5 approx distinct stays within 5% of exact per group") {
    val approx = Relational.x5SketchAgg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Sources.table(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(1L, math.round(0.05 * n)),
        s"$k: approx distinct $a vs exact $n exceeds 5%")
    }
  }

  test("x5 approx median lands between the exact p40 and p60 per group") {
    val approx = Relational.x5SketchAgg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val bounds = Sources.table(spark, sf, "events")
      .groupBy("event_type")
      .agg(percentile(col("value"), array(lit(0.4), lit(0.6))).as("b"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    bounds.foreach { case (k, Seq(lo, hi)) =>
      val a = approx(k)
      assert(a >= lo && a <= hi,
        s"$k: approx p50 $a outside exact [p40, p60] = [$lo, $hi]")
    }
  }

  test("x5 is deterministic run-to-run") {
    assert(rows(Relational.x5SketchAgg(spark, sf)) ==
      rows(Relational.x5SketchAgg(spark, sf)))
  }

  test("x14 sketch overlap tracks t15's exact matrix within declared error") {
    import graft.ops.TextOps
    val est = TextOps.x14SketchOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val exact = TextOps.t15SourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(est.keySet == exact.keySet, "sketch matrix covers different source pairs")
    exact.foreach { case (k, (na, nb, shared)) =>
      val (ea, eb, eu, es) = est(k)
      val union = na + nb - shared
      assert(math.abs(ea - na) <= 0.05 * na, s"$k: est_a $ea vs exact $na exceeds 5%")
      assert(math.abs(eb - nb) <= 0.05 * nb, s"$k: est_b $eb vs exact $nb exceeds 5%")
      assert(math.abs(eu - union) <= 0.05 * union,
        s"$k: est_union $eu vs exact $union exceeds 5%")
      // inclusion–exclusion differences amplify relative error when the
      // overlap is small, so the honest pin is ABSOLUTE in the set sizes
      assert(math.abs(es - shared) <= 0.05 * (na + nb),
        s"$k: est_shared $es vs exact $shared exceeds 0.05·(n_a+n_b)")
    }
  }

  test("x14 is deterministic run-to-run") {
    import graft.ops.TextOps
    assert(rows(TextOps.x14SketchOverlap(spark, sf)) ==
      rows(TextOps.x14SketchOverlap(spark, sf)))
  }
}
