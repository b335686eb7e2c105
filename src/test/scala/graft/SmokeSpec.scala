package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke (SURVEY.md §5.2#1): every declared query runs at sf0.001 and
  * returns a schema-stable, (almost always) non-empty result. */
class SmokeSpec extends AnyFunSuite {
  import TestSpark._

  /** Near-dup candidate queries may legitimately find no pairs in the
    * 50-doc fixture; everything else must produce rows. */
  private val mayBeEmpty = Set("d2_dedup_ngram_jaccard", "d3_dedup_minhash_lsh",
    "d5_embed_near_dup", "d13_consensus_near_dup")

  test("every query key has an oracle or is a declared rows-only check") {
    val rowsOnly = Set("x2_ml_score", "x3_ml_eval", "x4_ivf_kmeans",
      "x5_sketch_agg", "x6_pq_trained", "x7_res_trained",
      // x8/x12: DataSketches HLL bytes are engine-specific — DuckDB
      // cannot replay the estimate; merge-exactness + error pins live in
      // StreamEquivSpec
      "x8_stream_sketch", "x12_stream_window_distinct",
      // x14/x17: same HLL precedent as x8/x12 — error pins live in
      // ApproxSpec (x14) and StreamEquivSpec (x17)
      "x14_sketch_overlap", "x17_stream_growth")
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle entries without a query: ${o -- q}")
    assert((q -- o) == rowsOnly, s"queries without an oracle: ${(q -- o) -- rowsOnly}")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
