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
}
