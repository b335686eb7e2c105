package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.SimilarityOps

/** s11: streaming ANN-index ingest — the incremental form of s3's IVF,
  * completing the online story for the similarity family the way d12/p3
  * did for dedup (reference lineage: the consumer's per-batch
  * score-and-index loop, ConsumerESFinal.scala:86-94, with the model
  * swapped for the vector index).
  *
  * The coarse quantizer is an OFFLINE artifact, written once before the
  * stream starts (exactly how production IVF systems work: the quantizer
  * is trained ahead of time, ingest only assigns) — here s3's
  * deterministic seed centroids, so the DuckDB oracle replays the
  * identical cells. Per micro-batch of newly-arrived vectors:
  *
  *   1. normalize + assign each vector its nearest-centroid cell — a
  *      narrow map against the broadcast quantizer, batch-sized work;
  *   2. append (vec_id, v, nrm, label, cell) to the index store as an
  *      idempotent per-batch-directory overwrite.
  *
  * Queries are then answered FROM THE STORE: the probe joins queries to
  * their inverted list on the stored cell key and never runs the
  * quantizer over the corpus again — query-time assignment cost is zero
  * by construction (plan-locked: the store probe contains no centroid
  * attach at all). The gate checks the store-served answer against batch
  * s3's own DuckDB oracle, shared string — stream-built index ≡
  * batch-built index is the correctness claim.
  *
  * Scale design: per-batch cost is batch-size assignment + one append;
  * nothing joins anything corpus-sized. At 100 TB the store is
  * partitioned by arrival batch and bucketed by cell — the same layout
  * LayoutSpec proves for d12's band store — so the probe's inverted-list
  * read co-locates without a store-side exchange and compaction is
  * per-cell-local. Deletes/updates would ride a tombstone column merged
  * at probe time, orthogonal to the index shape.
  */
object StreamAnnIngest {

  /** Fixture re-split count, same rationale as [[IncrementalDedup]]:
    * one batch would vacuously reduce ingest to a batch build. */
  val SplitFiles = 4

  def s11StreamAnnIngest(spark: SparkSession, dir: String): DataFrame =
    s11WithBatchCount(spark, dir)._1

  /** Test seam: result + micro-batch count actually replayed. */
  private[graft] def s11WithBatchCount(spark: SparkSession, dir: String): (DataFrame, Int) = {
    val work = Files.createTempDirectory("graft_annstream_").toString
    val splitDir = s"$work/in"
    val all = SimilarityOps.normed(spark, dir)
    all.select("vec_id", "v", "nrm", "label")
      .repartitionByRange(SplitFiles, col("vec_id"))
      .write.parquet(splitDir)
    // the offline quantizer artifact: written once, read by every batch
    val seedsPath = s"$work/quantizer"
    SimilarityOps.ivfSeedCentroids(all).coalesce(1).write.parquet(seedsPath)
    val store = s"$work/index"
    val session = spark.newSession()
    val q = session.readStream
      .schema(session.read.parquet(splitDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(splitDir)
      .writeStream
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, seedsPath, store))
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val nBatches = Option(new java.io.File(store).listFiles())
      .map(_.count(_.getName.startsWith("batch_id="))).getOrElse(0)
    val result = SimilarityOps.probeAssigned(
      spark.read.parquet(store).drop("batch_id"))
    (result, nBatches)
  }

  private def processBatch(batch: DataFrame, batchId: Long,
                           seedsPath: String, store: String): Unit = {
    val spark = batch.sparkSession
    val seeds = spark.read.parquet(seedsPath)
    SimilarityOps.assignCells(batch, seeds)
      .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")
  }
}
