package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.io.Sources

/** x8: mergeable sketches across micro-batches — the streaming form of
  * x5's approximate aggregates, and the production motion behind
  * q17/q32's documented 100 TB swap-ins (reference lineage: the
  * consumer's per-batch aggregate-and-store loop,
  * ConsumerESFinal.scala:86-94, with the running count swapped for a
  * mergeable sketch).
  *
  * x5 proves the sketches' error at rest; x8 proves the property that
  * makes them the 100 TB answer: they MERGE. Per micro-batch of events:
  *
  *   1. build a per-event_type HLL sketch of the batch's user_ids
  *      (DataSketches `hll_sketch_agg`, lgK = [[LgK]]) plus the exact
  *      additive count — a map-side-combinable aggregation whose
  *      output is types × ≤1.5 KB, regardless of batch size;
  *   2. append the sketch rows to a batch-partitioned sketch store
  *      (idempotent per-batch-directory overwrite, the d12 move).
  *
  * The final answer never re-reads events: it merges the stored
  * partials register-wise (`hll_union_agg`) and estimates. HLL
  * register maxima are order- and partition-independent, so the merged
  * estimate is IDENTICAL to a single batch-built sketch over the whole
  * table — asserted bit-for-bit in StreamEquivSpec, alongside the
  * ≤5% error pin vs exact `count(DISTINCT user_id)` (lgK=12 → rsd
  * ≈1.6%, 3σ <5%).
  *
  * Scale design: this is how a 1000-executor cluster serves "distinct
  * users, updated each batch" over 100 TB — per-batch work is one
  * partial aggregate of the batch (no state store, no raw-event
  * retention), the sketch store grows by types × batches KILOBYTE
  * rows, and any window of batches can be merged after the fact at
  * interactive cost. The exact twin would re-shuffle every user_id
  * ever seen, per batch.
  *
  * Gate output: (event_type, approx_users, n_events) — rows-only by
  * declared design (DataSketches HLL internals are engine-specific, so
  * DuckDB cannot replay the estimate); the merge-exactness and error
  * pins live in StreamEquivSpec.
  */
object StreamSketch {

  /** Fixture re-split count, same rationale as [[IncrementalDedup]]:
    * one batch would vacuously reduce the merge to a batch build. */
  val SplitFiles = 4

  /** DataSketches HLL lgConfigK: 2^12 registers → rsd ≈ 1.04/√4096 ≈
    * 1.6%; the StreamEquivSpec pin allows 5% (≈3σ). */
  val LgK = 12

  def x8StreamSketch(spark: SparkSession, dir: String): DataFrame =
    x8WithBatchCount(spark, dir)._1

  /** Test seam: result + micro-batch count actually replayed. */
  private[graft] def x8WithBatchCount(spark: SparkSession, dir: String): (DataFrame, Int) = {
    val work = Files.createTempDirectory("graft_sketchstream_").toString
    val splitDir = s"$work/in"
    Sources.table(spark, dir, "events")
      .select("event_id", "event_type", "user_id")
      .repartitionByRange(SplitFiles, col("event_id"))
      .write.parquet(splitDir)
    val store = s"$work/sketches"
    val session = spark.newSession()
    val q = session.readStream
      .schema(session.read.parquet(splitDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(splitDir)
      .writeStream
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, store))
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val nBatches = Option(new java.io.File(store).listFiles())
      .map(_.count(_.getName.startsWith("batch_id="))).getOrElse(0)
    val result = spark.read.parquet(store).drop("batch_id")
      .groupBy("event_type")
      .agg(
        expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("approx_users"),
        sum("n_events").as("n_events"))
      .orderBy("event_type")
    (result, nBatches)
  }

  /** The batch twin: one sketch built over the whole table in a single
    * aggregation — StreamEquivSpec asserts the merged stream estimate
    * equals this exactly (register maxima are merge-invariant). */
  private[graft] def x8Batch(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        expr(s"hll_sketch_estimate(hll_sketch_agg(user_id, $LgK))")
          .as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  private def processBatch(batch: DataFrame, batchId: Long,
                           store: String): Unit =
    batch.groupBy("event_type")
      .agg(
        expr(s"hll_sketch_agg(user_id, $LgK)").as("sk"),
        count(lit(1)).as("n_events"))
      .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")
}
