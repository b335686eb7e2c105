package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamMediaDedup

/** r19 fold-equivalence pins for the m16/m21 ledger restructure: the
  * union + max-fold set diff (one exchange) must reproduce the
  * full-outer-join formulation it replaced ROW-FOR-ROW, on fixtures
  * that exercise every diff case — new pair, retracted pair, stable
  * pair, channel flip, empty previous set, empty current set. The
  * reference implementations here ARE the pre-r19 shapes (verbatim),
  * so a future edit to the product fold that changes any ledger value
  * fails loudly. */
class LedgerFoldSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def pairs(ps: (Long, Long)*): DataFrame =
    ps.toSeq.toDF("a_id", "b_id")
      .withColumn("hamming", lit(0L))

  /** The pre-r19 m16 diff: full-outer join + coalesce flags, feeding
    * the unchanged two-level digest fold. */
  private def ledgerViaFullOuter(cur: DataFrame, prev: DataFrame): DataFrame = {
    val fo = cur.select(col("a_id"), col("b_id"), lit(true).as("now_in"))
      .join(prev.select(col("a_id"), col("b_id"), lit(true).as("was_in")),
        Seq("a_id", "b_id"), "full_outer")
      .select(col("a_id"), col("b_id"),
        coalesce(col("now_in"), lit(false)).as("now_in"),
        coalesce(col("was_in"), lit(false)).as("was_in"))
    val addedF = col("now_in") && !col("was_in")
    val retractedF = !col("now_in") && col("was_in")
    val pairStr = (x: org.apache.spark.sql.Column) => concat(
      x.getField("a_id").cast("string"), lit(":"), x.getField("b_id").cast("string"))
    val perBucket = fo
      .withColumn("sb", pmod(col("a_id"), lit(StreamMediaDedup.DigestBuckets)))
      .groupBy("sb").agg(
        sum(when(col("now_in"), 1L).otherwise(0L)).as("b_pairs"),
        sum(when(addedF, 1L).otherwise(0L)).as("b_added"),
        sum(when(retractedF, 1L).otherwise(0L)).as("b_retracted"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(when(addedF, struct(col("a_id"), col("b_id"))))),
          pairStr))).as("add_sub"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(when(retractedF, struct(col("a_id"), col("b_id"))))),
          pairStr))).as("rm_sub"))
    perBucket.agg(
      coalesce(sum("b_pairs"), lit(0L)).as("n_pairs"),
      coalesce(sum("b_added"), lit(0L)).as("n_added"),
      coalesce(sum("b_retracted"), lit(0L)).as("n_retracted"),
      when(sum(col("b_added")) > 0,
        md5(concat_ws(",", transform(
          array_sort(collect_list(when(col("b_added") > 0,
            struct(col("sb"), col("add_sub"))))),
          x => x.getField("add_sub"))))).as("add_md5"),
      when(sum(col("b_retracted")) > 0,
        md5(concat_ws(",", transform(
          array_sort(collect_list(when(col("b_retracted") > 0,
            struct(col("sb"), col("rm_sub"))))),
          x => x.getField("rm_sub"))))).as("rm_md5"))
  }

  /** The pre-r19 m21 per-channel delta: full-outer join + the
    * entering/leaving two-frame union. */
  private def consensusLedgerViaFullOuter(cur: DataFrame, prev: DataFrame): DataFrame = {
    val fo = cur.join(prev, Seq("a_id", "b_id"), "full_outer")
    val entering = fo.filter(col("now_ch").isNotNull)
      .select(col("now_ch").as("channel"), lit(1L).as("p"),
        when(col("was_ch").isNull || col("was_ch") =!= col("now_ch"), 1L)
          .otherwise(0L).as("a"), lit(0L).as("r"))
    val leaving = fo.filter(col("was_ch").isNotNull &&
        (col("now_ch").isNull || col("now_ch") =!= col("was_ch")))
      .select(col("was_ch").as("channel"), lit(0L).as("p"),
        lit(0L).as("a"), lit(1L).as("r"))
    entering.unionByName(leaving)
      .groupBy("channel")
      .agg(sum("p").as("n_pairs"), sum("a").as("n_added"),
        sum("r").as("n_retracted"))
  }

  private def sortedRows(df: DataFrame): Vector[Vector[Any]] =
    rows(df).sortBy(_.mkString("|"))

  test("m16 ledgerFrame ≡ full-outer formulation: adds, retractions, stable pairs") {
    // buckets deliberately collide (a_id mod 16): 1 and 17 share sb=1
    val prev = pairs((1L, 2L), (17L, 20L), (3L, 9L), (5L, 6L))
    val cur = pairs((1L, 2L), (17L, 20L), (4L, 8L), (33L, 40L)) // drop 2, add 2
    assert(sortedRows(StreamMediaDedup.ledgerFrame(cur, prev)) ==
      sortedRows(ledgerViaFullOuter(cur, prev)))
  }

  test("m16 ledgerFrame ≡ full-outer on the empty-prev (batch 0) and empty-cur edges") {
    val none = pairs().limit(0)
    val some = pairs((7L, 9L), (23L, 25L))
    for ((c, p) <- Seq((some, none), (none, some), (none, none)))
      assert(sortedRows(StreamMediaDedup.ledgerFrame(c, p)) ==
        sortedRows(ledgerViaFullOuter(c, p)))
  }

  private def tagged(ch: String, ps: (Long, Long)*): DataFrame =
    ps.toSeq.toDF("a_id", "b_id").withColumn("ch", lit(ch))

  test("m21 consensusLedgerFrame ≡ full-outer formulation, incl. the channel flip") {
    // prev: (1,2) both, (3,4) image, (5,6) audio
    // cur:  (1,2) audio (FLIP: leaves both, enters audio), (3,4) image
    //       (stable), (7,8) both (new); (5,6) gone (retracted)
    val prev = tagged("both", (1L, 2L))
      .unionByName(tagged("image", (3L, 4L)))
      .unionByName(tagged("audio", (5L, 6L)))
      .select(col("a_id"), col("b_id"), col("ch").as("was_ch"))
    val cur = tagged("audio", (1L, 2L))
      .unionByName(tagged("image", (3L, 4L)))
      .unionByName(tagged("both", (7L, 8L)))
      .select(col("a_id"), col("b_id"), col("ch").as("now_ch"))
    assert(sortedRows(StreamMediaDedup.consensusLedgerFrame(cur, prev)) ==
      sortedRows(consensusLedgerViaFullOuter(cur, prev)))
    // and the batch-0 edge: empty previous set
    val prev0 = prev.limit(0)
    assert(sortedRows(StreamMediaDedup.consensusLedgerFrame(cur, prev0)) ==
      sortedRows(consensusLedgerViaFullOuter(cur, prev0)))
  }
}
