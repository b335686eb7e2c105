package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native bounded top-k aggregate (graft_topk): SQL registration,
  * k-bound, descending order, struct tie semantics vs the rank window,
  * null skipping, k-argument validation, and partial/merge correctness
  * under forced multi-partition folds. */
class TopKSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("registered in SQL, returns k largest sorted descending") {
    val out = spark.sql(
      "SELECT graft_topk(x, 3) AS t FROM (SELECT explode(array(5, 1, 9, 7, 3)) AS x)")
      .collect()(0).getSeq[Int](0)
    assert(out == Seq(9, 7, 5))
  }

  test("groups smaller than k emit what exists, never pad") {
    val out = spark.sql(
      "SELECT graft_topk(x, 5) AS t FROM (SELECT explode(array(2, 8)) AS x)")
      .collect()(0).getSeq[Int](0)
    assert(out == Seq(8, 2))
  }

  test("struct order reproduces the rank window's (c DESC, id ASC) answer exactly") {
    // 200 scored rows over 10 groups, scores chosen with deliberate ties
    val df = (0 until 200)
      .map(i => (i % 10, (i * 37 % 25) / 10.0, i.toLong))
      .toDF("g", "c", "id")
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("g").orderBy(col("c").desc, col("id"))
      df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
        .select("g", "id", "c", "rnk")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    }
    val viaTopK = df
      // force many partitions so partial buffers genuinely merge
      .repartition(8)
      .groupBy("g")
      .agg(call_function("graft_topk",
        struct(col("c"), (-col("id")).as("ni"), col("id")), lit(3)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.id"), col("col.c"), (col("pos") + 1).as("rnk"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaTopK == viaWindow)
  }

  test("null inputs are skipped, not ranked") {
    val out = spark.sql(
      "SELECT graft_topk(x, 2) AS t FROM (SELECT explode(array(4, NULL, 6, NULL)) AS x)")
      .collect()(0).getSeq[Int](0)
    assert(out == Seq(6, 4))
  }

  test("non-positive or non-foldable k is rejected at analysis") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_topk(x, 0) FROM (SELECT 1 AS x)").collect()
    }
    assert(e1.getMessage.contains("graft_topk"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_topk(x, x) FROM (SELECT 1 AS x)").collect()
    }
    assert(e2.getMessage.contains("graft_topk"))
  }

  test("dense-cell skew: one group holding ~all rows still matches the rank oracle, fold stays partial") {
    // The adversarial input the bounded aggregate exists for: a skewed
    // assignment concentrates ~all candidates in ONE group (the dense
    // cell that would OOM an unbounded collect_list buffer and that the
    // rank window would sort in full). 50k rows land in group 0 with
    // deliberate score ties across partitions; 3 sparse groups keep the
    // aggregation honest about mixed densities. The k-slot fold must
    // still produce the window's exact (c DESC, id ASC) answer, and the
    // pre-exchange partial must survive — the dense group crosses the
    // exchange as k rows, not 50k.
    val df = (0 until 50050)
      .map(i => (if (i < 50000) 0 else 1 + i % 3, (i * 37 % 1000) / 100.0, i.toLong))
      .toDF("g", "c", "id")
      .repartition(16)
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("g").orderBy(col("c").desc, col("id"))
      df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
        .select("g", "id", "c", "rnk")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    }
    val agg = df.groupBy("g")
      .agg(call_function("graft_topk",
        struct(col("c"), (-col("id")).as("ni"), col("id")), lit(5)).as("top"))
    assert(agg.queryExecution.executedPlan.toString.contains("partial_graft_topk"),
      "dense-skew plan lost the map-side partial — 50k rows would cross the exchange")
    val viaTopK = agg
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.id"), col("col.c"), (col("pos") + 1).as("rnk"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaTopK == viaWindow,
      "dense-group top-k diverged from the rank-window oracle")
  }

  test("plan shows the map-side partial (bounded pre-exchange fold)") {
    val df = (0 until 100).map(i => (i % 4, i)).toDF("g", "x").repartition(4)
    val plan = df.groupBy("g")
      .agg(call_function("graft_topk", col("x"), lit(3)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk"),
      "graft_topk lost its partial aggregation — every row would cross the exchange")
  }
}
