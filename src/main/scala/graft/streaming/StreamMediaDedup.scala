package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.ops.MultimodalOps

/** m15/m16/m18: the STREAMING members of the multimodal near-dup
  * family — completing the streaming column across all four gate
  * families (d12 streams the text near-dup chain, d20 the embedding
  * chain, p13 the sampling rule; m15/m18 stream the PERCEPTUAL-HASH
  * chains m13/m14 prove in batch, one per codec container through the
  * shared `fpFrom` seam). Media objects arrive in crawl batches; each
  * batch is fingerprinted ONCE through the real codec path
  * ([[MultimodalOps.ahashBandsFrom]] — m8's seek-decoded BMP thumbnail
  * — for m15; [[MultimodalOps.whashBandsFrom]] — the RIFF chunk walk —
  * for m18; the expensive map that must never re-run), the narrow
  * fingerprint rows (5 longs per object) append to a batch-partitioned
  * store, and
  * the current near-dup pair set is re-derived per batch over the
  * arrived fingerprints through [[MultimodalOps.bandedHammingPairs]]
  * VERBATIM — band explode, df ≤ AHashDfMax cap, capped equi-join
  * candidates, exact bit_count Hamming verify.
  *
  * Re-derive, not accrete — the p13 discipline, forced here by the df
  * cap: band document-frequency is a property of the ARRIVED corpus,
  * so the keep rule is NOT monotone. A band value under the cap at
  * batch b can cross it at b+1 (the saturated thumbnail band filling
  * up), at which point pairs that matched ONLY through that band are
  * no longer pairs of the batch chain — d12-style emit-once streaming
  * would silently keep them. m15 therefore maintains the materialized
  * pair set per batch, and m16 publishes the CHANGE FEED a downstream
  * dedup consumer (a victim-picker, a kept-set maintainer) actually
  * ingests: per batch, n_pairs / n_added / n_retracted with
  * sub-bucket-folded digests of the exact added and retracted pair
  * sets (null when empty — the p8/p14 rule). Batch 0 diffs against the
  * empty set (all-additions by construction); RETRACTIONS are the
  * non-monotone rule made auditable, proven to actually occur by
  * StreamEquivSpec's planted over-the-cap clique.
  *
  * Correctness: the final materialized set IS the batch gate's answer
  * over the full corpus — m15's oracle is m13's SQL verbatim (the
  * d20/d21 shared-string convention); m16's oracle replays the whole
  * feed closed-form (the m13 chain per wave under the `doc_id mod
  * SplitFiles ≤ b` membership rule [[StreamSketch.runWaveReplay]]
  * guarantees, a one-batch-shifted self-join, and the identical
  * two-level digest fold per direction).
  *
  * Scale design: each object's BYTES are read exactly once, in its
  * arrival batch (the codec map — at 100 TB of media that term
  * dominates everything); the per-batch re-derivation runs over the
  * accreting NARROW fingerprint store (5 longs per object, ~1/2000th
  * of even a small image), through the chain whose candidate cost the
  * batch gates bound (df-capped Σ bucket², never all-pairs). Per-batch
  * cost therefore grows with arrived FINGERPRINTS, not arrived media —
  * p13's stream-replay band, measured in ScaleCheck. The per-batch
  * pair-set write is output-sized (near-dup density, not corpus), and
  * the one-batch-back diff read makes a retried batch converge without
  * coordination: every write is an idempotent `batch_id=N` overwrite
  * and batch N reads only stores at `< N` plus its own re-derivation. */
object StreamMediaDedup {

  /** Sub-bucket count for the delta digest fold: added/retracted pair
    * sets digest per `a_id mod DigestBuckets` first (bounded buffers),
    * then once over the bucket-ordered sub-digests — p14's two-level
    * rule on pair rows. At 100 TB this scales like [[graft.ops.PipelineOps.MixBuckets]]. */
  val DigestBuckets = 16L

  def m15StreamNearDup(spark: SparkSession, dir: String): DataFrame =
    m15WithInfo(spark, dir)._1

  def m16NearDupDelta(spark: SparkSession, dir: String): DataFrame =
    m16WithInfo(spark, dir)._1

  /** m18: m15's streaming replay over the SECOND codec family — the
    * audio sample-hash fingerprint ([[MultimodalOps.whashBandsFrom]],
    * the RIFF chunk walk) through the SAME runner, quantizer-seam
    * style: only the fingerprint function swaps, so the stream verb is
    * proven across both containers exactly as m14 proved the batch
    * verb. Oracle = m14's SQL verbatim (the m15 ≡ m13 shared-string
    * move on the audio chain). */
  def m18StreamWavNearDup(spark: SparkSession, dir: String): DataFrame =
    m18WithInfo(spark, dir)._1

  /** Test seam: final pair set + replayed batch count. */
  private[graft] def m15WithInfo(spark: SparkSession, dir: String): (DataFrame, Int) = {
    val (pairs, _, n) = runReplay(spark, docsOf(spark, dir), "doc_id")
    (pairs, n)
  }

  /** Test seam: change-feed ledger + replayed batch count. */
  private[graft] def m16WithInfo(spark: SparkSession, dir: String): (DataFrame, Int) = {
    val (_, ledger, n) = runReplay(spark, docsOf(spark, dir), "doc_id")
    (ledger, n)
  }

  /** Test seam: final audio pair set + replayed batch count. */
  private[graft] def m18WithInfo(spark: SparkSession, dir: String): (DataFrame, Int) = {
    val docs = Sources.table(spark, dir, "documents")
      .select("doc_id", "lang", "text")
    val (pairs, _, n) = runReplay(spark, docs, "doc_id",
      d => MultimodalOps.whashBandsFrom(d))
    (pairs, n)
  }

  private def docsOf(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "documents").select("doc_id", "text")

  /** The replay runner over an arbitrary `(doc_id, text)` frame —
    * StreamEquivSpec drives it with a planted over-the-cap clique
    * (retraction proven to occur) and a reversed wave key (the final
    * set is arrival-order-free because every batch re-derives from the
    * order-free fingerprint store). `splitKey` must be a column whose
    * `mod SplitFiles` value assigns waves (doc_id for the gates);
    * `fpFrom` is the per-batch fingerprint function — the quantizer-
    * seam move: m15 plugs the image aHash, m18 the audio sample-hash,
    * and the replay/store/delta machinery is shared verbatim.
    * Returns (final pair set, change-feed ledger, batches replayed). */
  private[graft] def runReplay(spark: SparkSession, docs: DataFrame,
      splitKey: String,
      fpFrom: DataFrame => DataFrame =
        d => MultimodalOps.ahashBandsFrom(d.select("doc_id", "text")))
      : (DataFrame, DataFrame, Int) = {
    val work = Files.createTempDirectory("graft_mediadedup_").toString
    val fpStore = s"$work/fp"
    val curStore = s"$work/cur"
    val ledgerStore = s"$work/ledger"
    val n = StreamSketch.runWaveReplay(spark, docs, splitKey, work, ledgerStore) {
      (batch, batchId) =>
        processBatch(batch, batchId, fpStore, curStore, ledgerStore, fpFrom)
    }
    val pairs = spark.read.parquet(curStore)
      .filter(col("batch_id") === (n - 1).toLong)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy("a_id", "b_id")
    val ledger = spark.read.parquet(ledgerStore)
      .select(col("batch_id").cast("long").as("batch_id"), col("n_pairs"),
        col("n_added"), col("n_retracted"), col("add_md5"), col("rm_md5"))
      .orderBy("batch_id")
    (pairs, ledger, n)
  }

  /** `private[graft]` so the torn-write/redo spec can drive batches
    * directly: the delta's one-batch-back read is the shape the generic
    * crash test doesn't cover — a redone batch must re-diff against the
    * COMMITTED N−1 set, never double-count its own torn output. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long, fpStore: String,
                           curStore: String, ledgerStore: String,
                           fpFrom: DataFrame => DataFrame =
                             d => MultimodalOps.ahashBandsFrom(d.select("doc_id", "text")))
      : Unit = {
    val session = batch.sparkSession
    // the ONLY read of the batch's media bytes: the real codec map,
    // once per object, narrow fingerprint rows out
    fpFrom(batch)
      .write.mode("overwrite").parquet(s"$fpStore/batch_id=$batchId")
    // re-derive the pair set over ALL arrived fingerprints (own batch
    // included — the overwrite above makes the retry converge) through
    // the batch chain verbatim: stream ≡ batch as shared code
    val arrived = session.read.parquet(fpStore)
      .filter(col("batch_id") <= batchId).drop("batch_id")
    MultimodalOps.bandedHammingPairs(arrived)
      .write.mode("overwrite").parquet(s"$curStore/batch_id=$batchId")
    // the delta diffs the two COMMITTED materialized sets — the fresh
    // write read back (no chain recompute), the previous batch's set
    // (committed before this batch started; empty before the stream)
    val cur = session.read.parquet(s"$curStore/batch_id=$batchId")
      .select("a_id", "b_id", "hamming")
    val prev =
      if (batchId == 0)
        session.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), cur.schema)
      else session.read.parquet(s"$curStore/batch_id=${batchId - 1}")
    val fo = cur.select(col("a_id"), col("b_id"), lit(true).as("now_in"))
      .join(prev.select(col("a_id"), col("b_id"), lit(true).as("was_in")),
        Seq("a_id", "b_id"), "full_outer")
      .select(col("a_id"), col("b_id"),
        coalesce(col("now_in"), lit(false)).as("now_in"),
        coalesce(col("was_in"), lit(false)).as("was_in"))
    val added = col("now_in") && !col("was_in")
    val retracted = !col("now_in") && col("was_in")
    val pairStr = (x: org.apache.spark.sql.Column) => concat(
      x.getField("a_id").cast("string"), lit(":"), x.getField("b_id").cast("string"))
    // two-level digest fold per direction (p14's rule on pair rows):
    // per-sub-bucket sorted-pair sub-digests, then one fold over the
    // bucket-ordered sub-digest list — no pair-set-sized buffer
    val perBucket = fo
      .withColumn("sb", pmod(col("a_id"), lit(DigestBuckets)))
      .groupBy("sb").agg(
        sum(when(col("now_in"), 1L).otherwise(0L)).as("b_pairs"),
        sum(when(added, 1L).otherwise(0L)).as("b_added"),
        sum(when(retracted, 1L).otherwise(0L)).as("b_retracted"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(when(added, struct(col("a_id"), col("b_id"))))),
          pairStr))).as("add_sub"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(when(retracted, struct(col("a_id"), col("b_id"))))),
          pairStr))).as("rm_sub"))
    // coalesce: a batch with an empty diff frame (no pairs yet at all)
    // aggregates over zero sub-bucket rows and must still ledger 0s
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
      .write.mode("overwrite").parquet(s"$ledgerStore/batch_id=$batchId")
  }
}
