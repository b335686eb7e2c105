package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.ops.{PipelineOps, TextOps}

/** p13: the streaming member of the SAMPLING family — where p11/p12
  * monitor the blend (budgets only), p13 maintains the actual KEPT SET
  * as document batches arrive: after every micro-batch it re-derives
  * p9's largest-feasible budgets over the arrived corpus and re-runs
  * the prefix keep rule (u-hash preference order, cumulative tokens up
  * to the budget), appending one ledger row per source with the kept
  * counts AND the bucket-folded digest of the exact kept-id set. The
  * ledger answers the question p11's totals can't: "which documents
  * are IN the training blend as of today's crawl state" — auditable
  * per batch, byte-exact, without ever storing the kept set itself.
  *
  * The keep set is NOT monotone across batches (a newly-arrived doc
  * with a small u inserts into its source's preference prefix and can
  * evict the previous tail doc even as the budget grows), which is
  * precisely why the gate re-derives rather than accretes verdicts:
  * the sampler's correctness law is "after batch b, the kept set
  * equals the BATCH sampler's answer over the arrived corpus" —
  * enforced per batch by the oracle (every (batch, source) row
  * re-derived in closed form from the wave rule `doc_id mod
  * [[StreamSketch.SplitFiles]] ≤ b`) and pinned at the final batch
  * against p9 itself, whose machinery ([[PipelineOps.sampleKeepFrame]]
  * + [[PipelineOps.sampleLedger]]) runs here verbatim.
  *
  * Scale design: the batch's text is scanned ONCE (tokenize → narrow
  * (doc_id, source, n_tok) rows appended to the stats store) and never
  * rescanned; each re-derivation runs over the accreting NARROW store
  * — 3 columns, no text — through the same two-level prefix sum and
  * bucket-folded digest the batch gates prove bounded (the one
  * corpus-sized exchange is the (source, bucket) hash partition of
  * 4-column rows). Per-batch cost therefore grows with the arrived
  * STATS, not the arrived text — the stream-replay family's documented
  * band — and the per-batch cache of that narrow frame is dropped
  * before the next batch ([[PipelineOps.sampleKeepFrameCached]]), so
  * executor memory holds one arrived-stats copy, not one per batch.
  * Both stores grow append-only by bounded rows per batch; both
  * per-batch writes are idempotent directory overwrites, so a retried
  * batch converges (heal-before-write per the store-open contract).
  */
object StreamSampler {

  def p13StreamSample(spark: SparkSession, dir: String): DataFrame =
    p13WithBatchCount(spark, dir)._1

  /** Test seam: result + replayed micro-batch count (StreamEquivSpec
    * asserts the ledger genuinely accreted across all waves). */
  private[graft] def p13WithBatchCount(spark: SparkSession, dir: String)
      : (DataFrame, Int) = {
    val work = Files.createTempDirectory("graft_samplemon_").toString
    val stats = s"$work/stats"
    val ledger = s"$work/ledger"
    val docs = Sources.table(spark, dir, "documents")
      .select("doc_id", "source", "text")
    val nBatches = StreamSketch.runWaveReplay(spark, docs, "doc_id", work, ledger) {
      (batch, batchId) => sampleBatch(batch, batchId, stats, ledger)
    }
    val result = spark.read.parquet(ledger)
      .select(col("batch_id").cast("long").as("batch_id"), col("source"),
        col("w"), col("budget"), col("n_docs"), col("n_tok"),
        col("n_docs_sampled"), col("n_tok_sampled"), col("sample_md5"))
      .orderBy("batch_id", "source")
    (result, nBatches)
  }

  private def sampleBatch(batch: DataFrame, batchId: Long,
                          stats: String, ledger: String): Unit = {
    val session = batch.sparkSession
    // store-open heal FIRST, before the per-batch write (the p11/p12
    // contract: a crashed swap's only full-history copy must be
    // promoted back before a fresh partial could mask it)
    StreamSketch.healRetiredStore(session, stats)
    // the batch's narrow stats — the only thing that reads its text
    batch
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .write.mode("overwrite").parquet(s"$stats/batch_id=$batchId")
    // re-derive the blend over the ARRIVED corpus: p9's keep rule and
    // ledger digest, verbatim, over the batch-pruned narrow store
    val arrived = session.read.parquet(stats)
      .filter(col("batch_id") <= batchId)
      .select("doc_id", "source", "n_tok")
    val (cum, cached) = PipelineOps.sampleKeepFrameCached(
      arrived, TextOps.sourceWeight(col("source")))
    try {
      PipelineOps.sampleLedger(cum)
        .write.mode("overwrite").parquet(s"$ledger/batch_id=$batchId")
    } finally { cached.unpersist(); () }
  }
}
