package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.ScoringPipeline

/** Golden outputs for the ML pipeline (SURVEY.md §5.2#5) — the checked,
  * programmatic successor of the reference's eyeballed test.txt capture.
  * x2/x3 have no SQL oracle (model training isn't SQL-expressible), so
  * these pins are their correctness gate. */
class MlGoldenSpec extends AnyFunSuite {
  import TestSpark._

  test("x2 scored class counts match the golden capture (sf0.001)") {
    val got = rows(ScoringPipeline.x2MlScore(spark, sf))
      .map(r => (r(0), r(1), r(2)))
    val expected = Vector(
      ("flagged", "click", 2L), ("flagged", "error", 4L),
      ("flagged", "purchase", 39L), ("flagged", "signup", 3L),
      ("flagged", "view", 3L), ("normal", "click", 208L),
      ("normal", "error", 197L), ("normal", "purchase", 163L),
      ("normal", "signup", 196L), ("normal", "view", 185L))
    assert(got == expected)
  }

  test("x3 holdout evaluation matches the golden capture (sf0.001)") {
    val got = rows(ScoringPipeline.x3MlEval(spark, sf))
    assert(got == Vector(Vector("decision_tree_holdout", 256L, 203L, 0.793)))
  }

  test("x2 is deterministic across invocations") {
    val a = rows(ScoringPipeline.x2MlScore(spark, sf))
    val b = rows(ScoringPipeline.x2MlScore(spark, sf))
    assert(a == b)
  }

  test("x4 KMeans-IVF is deterministic across invocations (seed-pinned training)") {
    val a = rows(graft.ops.SimilarityOps.x4IvfKmeans(spark, sf))
    val b = rows(graft.ops.SimilarityOps.x4IvfKmeans(spark, sf))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("x4 probes trained cells with the same output contract as s3") {
    import org.apache.spark.sql.functions._
    val x4 = graft.ops.SimilarityOps.x4IvfKmeans(spark, sf)
    val s3 = graft.ops.SimilarityOps.s3AnnIvf(spark, sf)
    assert(x4.schema.catalogString == s3.schema.catalogString,
      "trained quantizer changed the probe's output schema")
    // per-query top-k contract holds under the trained quantizer
    val bad = x4.groupBy("q_id").agg(count(lit(1)).as("n"), max("rnk").as("mr"))
      .filter(col("n") > 3 || col("mr") > 3).count()
    assert(bad == 0, "a query returned more than top-3 under the trained quantizer")
    // and the trained cells actually retrieve true neighbours: some overlap
    // with the exact top-3 must exist
    val exact = graft.ops.SimilarityOps.q22KnnCosine(spark, sf)
      .filter(col("rnk") <= 3).select("q_id", "n_id")
    assert(x4.select("q_id", "n_id").join(exact, Seq("q_id", "n_id")).count() > 0,
      "trained-quantizer probe retrieved no true neighbours at all")
  }

  test("x6 trained-PQ is deterministic across invocations (seed-pinned per subspace)") {
    val a = rows(graft.ops.SimilarityOps.x6PqTrained(spark, sf))
    val b = rows(graft.ops.SimilarityOps.x6PqTrained(spark, sf))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("x7 trained residual book is deterministic and keeps s8's output contract") {
    import org.apache.spark.sql.functions._
    val a = rows(graft.ops.SimilarityOps.x7ResTrained(spark, sf))
    val b = rows(graft.ops.SimilarityOps.x7ResTrained(spark, sf))
    assert(a == b)
    assert(a.nonEmpty)
    val x7 = graft.ops.SimilarityOps.x7ResTrained(spark, sf)
    val s8 = graft.ops.SimilarityOps.s8AnnIvfPqRes(spark, sf)
    assert(x7.schema.catalogString == s8.schema.catalogString,
      "trained residual codebook changed the ADC scan's output schema")
    // golden recall pins (47 queries × top-3 at sf0.001): the trained
    // residual book vs the seed-sampled residual book on the identical
    // plan — training must not fall behind the seed trick
    val exact = graft.ops.SimilarityOps.q22KnnCosine(spark, sf)
      .filter(col("rnk") <= 3).select("q_id", "n_id")
    val trainedHits = x7.select("q_id", "n_id").join(exact, Seq("q_id", "n_id")).count()
    val seedHits = s8.select("q_id", "n_id").join(exact, Seq("q_id", "n_id")).count()
    assert(trainedHits == 14L, s"trained-residual hits drifted: $trainedHits")
    assert(seedHits == 11L, s"seed-residual hits drifted: $seedHits")
    assert(trainedHits > seedHits,
      "trained residual book no longer beats the seed-sampled book")
  }

  test("x6 scans trained codes with the same output contract as s5, better recall") {
    import org.apache.spark.sql.functions._
    val x6 = graft.ops.SimilarityOps.x6PqTrained(spark, sf)
    val s5 = graft.ops.SimilarityOps.s5AnnPq(spark, sf)
    assert(x6.schema.catalogString == s5.schema.catalogString,
      "trained codebook changed the ADC scan's output schema")
    val bad = x6.groupBy("q_id").agg(count(lit(1)).as("n"), max("rnk").as("mr"))
      .filter(col("n") > 3 || col("mr") > 3).count()
    assert(bad == 0, "a query returned more than top-3 under the trained codebook")
    // golden recall pins (47 queries × top-3 at sf0.001): KMeans codebooks
    // recall 33/141 true neighbours vs 22/141 for the deterministic-seed
    // codebooks — training must keep strictly beating the seed trick
    val exact = graft.ops.SimilarityOps.q22KnnCosine(spark, sf)
      .filter(col("rnk") <= 3).select("q_id", "n_id")
    val trainedHits = x6.select("q_id", "n_id").join(exact, Seq("q_id", "n_id")).count()
    val seedHits = s5.select("q_id", "n_id").join(exact, Seq("q_id", "n_id")).count()
    assert(trainedHits == 33L, s"trained-PQ hits drifted: $trainedHits")
    assert(seedHits == 22L, s"seed-PQ hits drifted: $seedHits")
    assert(trainedHits > seedHits,
      "trained codebooks no longer beat the deterministic-seed codebooks")
  }
}
