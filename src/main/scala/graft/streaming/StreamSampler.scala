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

  /** Batches-axis instrument seam (ScaleCheck `p13_batches_axis`):
    * replay [[sampleBatch]] over `waves` micro-batches at FIXED data,
    * returning each batch's body wall seconds in batch order — p13
    * re-derives the keep rule per batch over the accreting NARROW
    * stats store, so its per-batch cost legitimately grows with
    * arrived STATS (3-column rows); the instrument prices that term. */
  private[graft] def p13BatchTimes(spark: SparkSession, dir: String,
      waves: Int): Seq[Double] = {
    val work = Files.createTempDirectory("graft_samplemon_ax_").toString
    val stats = s"$work/stats"
    val ledger = s"$work/ledger"
    val docs = Sources.table(spark, dir, "documents")
      .select("doc_id", "source", "text")
    val buf = scala.collection.mutable.ArrayBuffer.empty[Double]
    StreamSketch.runWaveReplay(spark, docs, "doc_id", work, ledger, waves) {
      (batch, batchId) =>
        val t0 = System.nanoTime()
        sampleBatch(batch, batchId, stats, ledger)
        buf += (System.nanoTime() - t0) / 1e9
    }
    buf.toSeq
  }

  // ---- p14: the kept-set CHANGE feed ---------------------------------

  def p14SampleDelta(spark: SparkSession, dir: String): DataFrame =
    p14WithBatchCount(spark, dir)._1

  /** p14 sample-delta: the kept-set CHANGE feed — p13 answers "which
    * documents are in the blend as of batch b"; p14 answers the question
    * every downstream consumer of that blend (a tokenizer cache, an
    * incremental trainer, a billing ledger) actually asks: "what
    * CHANGED since the last crawl batch". Because the keep set is not
    * monotone (p13's eviction note: a late small-u doc inserts into its
    * source's preference prefix and pushes the previous tail doc out
    * even as budgets grow), the delta has BOTH directions — per
    * (batch, source) the ledger carries n_kept / n_added / n_evicted
    * plus bucket-folded digests of the exact added and evicted id sets
    * (null when empty, the p8/p9 zero-sample rule). Batch 0 compares
    * against the empty blend, so its row is all-additions by
    * construction.
    *
    * Correctness: both kept sets are re-derived per batch from p9's
    * machinery verbatim ([[graft.ops.PipelineOps.sampleKeepFrameCached]]
    * over the arrived stats at b and b−1), and the oracle replays the
    * whole feed in closed form — the keep CTE per wave, a shifted
    * self-join on (batch, doc), and the identical two-level digest
    * fold over each difference set.
    *
    * Scale: two keep-rule derivations per batch over the accreting
    * NARROW store (p13's band, twice), one doc_id-keyed full-outer join
    * of two kept sets (4-column rows, never text), and the bounded
    * bucket-folded digests — per-batch state in any single aggregation
    * buffer stays ≤ set/(sources·buckets) ids. Both per-batch caches
    * are dropped before the next batch. */
  private[graft] def p14WithBatchCount(spark: SparkSession, dir: String)
      : (DataFrame, Int) = {
    val work = Files.createTempDirectory("graft_sampledelta_").toString
    val stats = s"$work/stats"
    val ledger = s"$work/ledger"
    val docs = Sources.table(spark, dir, "documents")
      .select("doc_id", "source", "text")
    val nBatches = StreamSketch.runWaveReplay(spark, docs, "doc_id", work, ledger) {
      (batch, batchId) => deltaBatch(batch, batchId, stats, ledger)
    }
    val result = spark.read.parquet(ledger)
      .select(col("batch_id").cast("long").as("batch_id"), col("source"),
        col("n_kept"), col("n_added"), col("n_evicted"),
        col("added_md5"), col("evicted_md5"))
      .orderBy("batch_id", "source")
    (result, nBatches)
  }

  /** The kept rows (doc_id, source, u, bucket) of the blend over the
    * arrived corpus through batch `upTo`, plus the cached stats handle
    * to drop after use. */
  private def keptAt(session: SparkSession, stats: String, upTo: Long)
      : (DataFrame, DataFrame) = {
    val arrived = session.read.parquet(stats)
      .filter(col("batch_id") <= upTo)
      .select("doc_id", "source", "n_tok")
    val (cum, cached) = PipelineOps.sampleKeepFrameCached(
      arrived, TextOps.sourceWeight(col("source")))
    (cum.filter(col("keep")).select("doc_id", "source", "u", "bucket"),
      cached)
  }

  private def deltaBatch(batch: DataFrame, batchId: Long,
                         stats: String, ledger: String): Unit = {
    val session = batch.sparkSession
    StreamSketch.healRetiredStore(session, stats)
    batch
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .write.mode("overwrite").parquet(s"$stats/batch_id=$batchId")
    // kept(b) is derived ONCE per batch and committed to a per-batch
    // kept store; the diff's prev side reads the COMMITTED kept(b−1)
    // instead of re-deriving it from the stats store — the previous
    // batch already computed exactly that frame (guide §1.1/§1.2:
    // don't recompute what you already have; kept(b−1) is a pure
    // function of committed stats ≤ b−1, so the committed copy is
    // byte-equivalent to the re-derivation, and the oracle's
    // closed-form replay is unchanged). Halves the dominant per-batch
    // term: one prefix-sum derivation instead of two. Retry-safe: a
    // redone batch overwrites batch_id=b and reads committed b−1.
    // Only partitions b and b−1 are ever read, so older kept
    // partitions are vacuumable in production (x18's window rule) —
    // the store adds no corpus-lifetime growth beyond the stats store
    // it sits next to.
    val keptStore = s"${stats}_kept"
    val nowPair = keptAt(session, stats, batchId)
    try {
      nowPair._1.write.mode("overwrite").parquet(s"$keptStore/batch_id=$batchId")
    } finally { nowPair._2.unpersist(); () }
    val committed = session.read.parquet(s"$keptStore/batch_id=$batchId")
    locally {
      val now = committed.select(col("doc_id"), col("source").as("n_src"),
        col("u").as("n_u"), col("bucket").as("n_b"))
      val prev = (if (batchId == 0)
          committed.filter(lit(false))
        else session.read.parquet(s"$keptStore/batch_id=${batchId - 1}"))
        .select(col("doc_id"), col("source").as("p_src"),
          col("u").as("p_u"), col("bucket").as("p_b"))
      // a doc's (source, u, bucket) are functions of doc_id, invariant
      // across waves — the doc_id-keyed full outer is the whole diff
      val fo = now.join(prev, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("n_src"), col("p_src")).as("source"),
          coalesce(col("n_u"), col("p_u")).as("u"),
          coalesce(col("n_b"), col("p_b")).as("bucket"),
          col("n_src").isNotNull.as("now_in"),
          col("p_src").isNotNull.as("was_in"))
      val added = col("now_in") && !col("was_in")
      val evicted = !col("now_in") && col("was_in")
      // the same two-level digest fold as sampleLedger, once per
      // direction: bucket sub-digests (bounded buffers), then the
      // bucket-ordered fold per source
      val perBucket = fo.groupBy("source", "bucket").agg(
        sum(when(col("now_in"), 1L).otherwise(0L)).as("b_kept"),
        sum(when(added, 1L).otherwise(0L)).as("b_added"),
        sum(when(evicted, 1L).otherwise(0L)).as("b_evicted"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(when(added, struct(col("u"), col("doc_id"))))),
          x => x.getField("doc_id").cast("string")))).as("add_sub"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(when(evicted, struct(col("u"), col("doc_id"))))),
          x => x.getField("doc_id").cast("string")))).as("ev_sub"))
      perBucket.groupBy("source").agg(
          sum("b_kept").as("n_kept"),
          sum("b_added").as("n_added"),
          sum("b_evicted").as("n_evicted"),
          when(sum(col("b_added")) > 0,
            md5(concat_ws(",", transform(
              array_sort(collect_list(when(col("b_added") > 0,
                struct(col("bucket"), col("add_sub"))))),
              x => x.getField("add_sub"))))).as("added_md5"),
          when(sum(col("b_evicted")) > 0,
            md5(concat_ws(",", transform(
              array_sort(collect_list(when(col("b_evicted") > 0,
                struct(col("bucket"), col("ev_sub"))))),
              x => x.getField("ev_sub"))))).as("evicted_md5"))
        .write.mode("overwrite").parquet(s"$ledger/batch_id=$batchId")
    }
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
