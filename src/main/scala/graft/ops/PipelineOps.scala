package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.io.Sources

/** The composed corpus-preparation run (SURVEY.md §2.5 p1): the d/t
  * operators chained the way a pretraining data pass actually chains
  * them — hold out the benchmark split, drop low-quality docs, drop
  * exact duplicates, drop near-dup cluster members, drop benchmark-
  * contaminated docs, and account for every document along the way.
  *
  * The point of the gate is COMPOSITION: each stage reuses the same
  * code path its standalone gate verifies (t10's per-doc rule verdicts,
  * d1's normalized digest, d10's cluster table, d8's contamination
  * set), so the ledger is correct-by-construction relative to the
  * already-oracle-checked parts, and the oracle re-derives the whole
  * funnel in one nested SQL statement.
  */
object PipelineOps {

  /** p1 pipeline ledger: per (lang, source), the document funnel
    * `n_docs → n_eval (held out) → n_fail_quality → n_exact_dup →
    * n_near_dup → n_contam → n_kept` plus the surviving token count —
    * each stage counted among the survivors of the previous one, so the
    * columns sum to n_docs exactly (InvariantSpec locks this).
    *
    * Stage semantics: eval docs (doc_id ≡ 0 mod [[DedupOps.EvalMod]])
    * leave first — they are the benchmark, not training data. Quality
    * is t10's four gopher rules (empty docs fail). Exact dedup keeps
    * the smallest doc_id per normalized-text digest AMONG eligible docs
    * (a duplicate whose twin was already dropped survives — dropping it
    * would lose the last copy). Near-dup applies d10's global keep-one
    * decision; contamination applies d8's eval-overlap set.
    *
    * Scale shape: the funnel head is one narrow rule map + a per-group
    * count. The tail shuffles digests (32-byte keys) for the exact-dup
    * window, then attaches two SMALL-by-construction tables (d10's
    * clusters ≈ near-dup members only, d8's contaminated set) by
    * doc_id joins AQE is free to broadcast — the corpus itself is
    * never joined to anything corpus-sized. */
  /** The funnel head, per document: `(doc_id, lang, source, norm_key,
    * is_eval, q, wc)` — eval-holdout flag, t10's quality verdict (empty
    * docs fail), d1's normalized digest. Entirely narrow (the rules join
    * is doc_id-aligned and Catalyst collapses it over one scan); shared
    * by batch p1 and the per-micro-batch body of streaming p2. */
  private[graft] def headFlags(docs: DataFrame): DataFrame = {
    val rules = TextOps.gopherPerDoc(docs)
      .select(col("doc_id"), col("wc"),
        (col("r_wc") && col("r_mean") && col("r_stop") && col("r_top")).as("q"))
    docs
      .select(col("doc_id"), col("lang"), col("source"),
        md5(TextOps.normText(col("text"))).as("norm_key"),
        (col("doc_id") % DedupOps.EvalMod === 0).as("is_eval"))
      .join(rules, Seq("doc_id"), "left")
      .withColumn("q", coalesce(col("q"), lit(false)))
      .withColumn("wc", coalesce(col("wc"), lit(0L)))
  }

  /** The funnel tail as a per-document frame: every ELIGIBLE doc
    * (non-eval, quality-passing) with its final stage label — the frame
    * p1 aggregates into the ledger and p4 filters for the kept set, so
    * the two gates share one curation semantics by construction. */
  private[graft] def stagedEligible(spark: SparkSession, dir: String,
                                    flagged: DataFrame): DataFrame = {
    val elig = flagged.filter(!col("is_eval") && col("q"))
    val keepExact =
      col("doc_id") === min("doc_id").over(Window.partitionBy("norm_key"))
    // labels-only cluster map + membership-only contamination set: the
    // funnel consumes neither cluster_size nor the per-doc overlap
    // counts, so the d10/d8 gate outputs' size join, Expand'd
    // count-distincts and global sorts are not re-paid here (the
    // verdicts are identical — see the two helpers' docs)
    val clusters = DedupOps.dupClusterLabels(spark, dir)
    val contam = DedupOps.contaminatedIds(spark, dir)
      .select(col("doc_id"), lit(true).as("ct"))
    elig
      .withColumn("keep_exact", keepExact)
      .join(clusters, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("stage",
        when(!col("keep_exact"), "exact")
          .when(col("cluster_id").isNotNull && col("cluster_id") =!= col("doc_id"), "near")
          .when(coalesce(col("ct"), lit(false)), "contam")
          .otherwise("kept"))
  }

  def p1PipelineLedger(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
    val flagged = headFlags(docs)
    val staged = stagedEligible(spark, dir, flagged)
    val head = flagged.groupBy("lang", "source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("is_eval"), 1L).otherwise(0L)).as("n_eval"),
      sum(when(!col("is_eval") && !col("q"), 1L).otherwise(0L)).as("n_fail_quality"))
    val tail = staged.groupBy("lang", "source").agg(
      sum(when(col("stage") === "exact", 1L).otherwise(0L)).as("n_exact_dup"),
      sum(when(col("stage") === "near", 1L).otherwise(0L)).as("n_near_dup"),
      sum(when(col("stage") === "contam", 1L).otherwise(0L)).as("n_contam"),
      sum(when(col("stage") === "kept", 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("stage") === "kept", col("wc")).otherwise(0L)).as("tok_kept"))
    head.join(tail, Seq("lang", "source"), "left")
      .na.fill(0L, Seq("n_exact_dup", "n_near_dup", "n_contam", "n_kept", "tok_kept"))
      .orderBy("lang", "source")
  }

  /** p4 curate-then-pack: the EXPORT step p1 stops short of — the
    * funnel's kept documents (same [[stagedEligible]] labels, shared
    * with p1 by construction) laid into t13's packing geometry and
    * DIGESTED: per (source, shard), the doc count, token count, the
    * fixed-length sequence count ⌈tokens / SeqTokens⌉, and the md5 of
    * the shard's packed token stream (documents concatenated in doc_id
    * order — the byte stream a training writer would emit through this
    * exact plan). The content digest is what t13's arithmetic ledger
    * can't give: a wrong keep decision, a doc ordered out of place, or
    * a token dropped anywhere upstream lands in `pack_md5`.
    *
    * Scale shape: the funnel tail reuses p1's digest-keyed joins
    * (proven non-corpus-sized); packing adds ONE hash exchange on
    * (source, shard) where a shard holds ≤ [[TextOps.ShardDocs]] docs
    * by construction — per-shard concat is bounded, shards are
    * embarrassingly parallel, nothing global. The output is
    * shards-sized, not corpus-sized: the manifest a 100 TB export job
    * ships to the trainer. */
  def p4CuratePack(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
    val kept = stagedEligible(spark, dir, headFlags(docs))
      .filter(col("stage") === "kept")
      .select("doc_id", "source")
    packShards(kept.join(tokenized(docs), Seq("doc_id")))
  }

  /** The packed-token view every export gate joins against:
    * `(doc_id, s, n_tok)` — the doc's space-joined token stream and its
    * length, empty docs dropped. One source, shared by p4/p5/p10. */
  private def tokenized(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"), concat_ws(" ", col("ts")).as("s"),
        size(col("ts")).cast("long").as("n_tok"))

  /** p4's pack aggregation over a `(doc_id, source, s, n_tok)` frame:
    * ShardDocs geometry, t13 sequence counts, doc_id-ordered content
    * digest. One source, shared by p4 and p10 so an edit to the pack
    * (delimiter, sort key, rounding) can never reach one gate and miss
    * the other — the correct-by-construction composition claim. */
  private def packShards(docs: DataFrame): DataFrame =
    docs
      .withColumn("shard", floor(col("doc_id") / lit(TextOps.ShardDocs)).cast("long"))
      .groupBy("source", "shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tok"),
        array_sort(collect_list(struct(col("doc_id"), col("s")))).as("a"))
      .withColumn("n_seqs",
        floor((col("n_tok") + lit(TextOps.SeqTokens - 1)) / lit(TextOps.SeqTokens)).cast("long"))
      .withColumn("pack_md5",
        md5(concat_ws(" ", transform(col("a"), x => x.getField("s")))))
      .select(col("source"), col("shard"), col("n_docs"), col("n_tok"),
        col("n_seqs"), col("pack_md5"))
      .orderBy("source", "shard")

  /** Output shard count for p5's training-order reshuffle. At 100 TB this
    * constant scales with the corpus (shards ≈ corpus / target-shard-size)
    * — per-shard work is bounded by construction either way. */
  val OutShards = 8L

  /** Range-bucket count for p8's distributed prefix sum. At 100 TB this
    * scales with executor count (buckets ≈ a few × cores) — the point is
    * only that per-(source, bucket) slices are small and numerous where
    * per-source slices are huge and few. */
  val MixBuckets = 64L

  /** p8 mixture-sample: BALANCED-MIXTURE token-budget sampling — the
    * source-reweighting read every training-data pipeline runs between
    * curation and packing ("sample each source down to a common token
    * budget", the uniform-mixture special case of the DoReMi /
    * Pile-style domain-weight rebalance; [[p9WeightedMixture]] is the
    * general weighted form over the same machinery). The budget is the
    * SMALLEST source's token total — every other source is sampled down
    * to it, so the output mixture is uniform across sources by token
    * count (± one boundary document per source, included by the prefix
    * rule below).
    *
    * Selection must be deterministic and order-free, so the preference
    * order is t14's multiplicative hash (u = (doc_id mod 2³¹) ·
    * 2654435761 mod 2³¹ — pure integer arithmetic, replayed exactly by
    * the oracle): a source keeps its docs in ascending-u order until
    * the running token total crosses the budget (the crossing doc is
    * kept — budgets are floors, not ceilings). Per source the gate
    * emits the ledger (docs/tokens available, docs/tokens sampled) plus
    * a bucket-folded md5 over the sampled doc_id list — the digest pins
    * the exact document SET, not just its size, without ever holding
    * one source's kept ids in a single aggregation buffer.
    *
    * Scale shape — the reason this is not one window per source: a
    * running total over (source ORDER BY u) is a prefix sum with
    * source-count parallelism (a handful of huge partitions at 100 TB —
    * the classic low-cardinality window skew). The standard fix is the
    * TWO-LEVEL distributed prefix sum, exact and oracle-identical
    * because the bucket key is a RANGE of u (bucket = ⌊u / 2²⁵⌋, [[MixBuckets]]
    * buckets — monotone in u, so bucket order refines u order):
    * per-(source, bucket) token totals cumsum across buckets (a
    * sources × buckets table — tiny), each doc's prefix = its bucket's
    * offset + the within-(source, bucket) running total, giving
    * sources × [[MixBuckets]] way parallelism with no corpus-sized sort
    * and no skewed window. The only corpus-sized exchange is the ONE
    * hash partition on (source, bucket); the stats frame it moves is
    * 4 narrow columns, never the text. */
  def p8MixtureSample(spark: SparkSession, dir: String): DataFrame =
    mixtureSample(spark, dir, lit(1L))
      .select(col("source"), col("n_docs"), col("n_tok"),
        col("n_docs_sampled"), col("n_tok_sampled"), col("sample_md5"))
      .orderBy("source")

  /** p9 weighted-mixture: p8 with a DECLARED per-source weight table —
    * the full DoReMi / Pile-style domain-weight rebalance p8's scaladoc
    * promised was "mechanics identical". Weights are t14's rule
    * verbatim (w = (srcN mod 4) + 1 — the one weight table the repo
    * declares, so the doc-count blend t14 reports and the token-budget
    * blend p9 enforces are the SAME mixture read at two granularities;
    * production would load the table from config, and the join seam is
    * the same either way). The largest-feasible-blend rule, reconciled
    * with t14's: the BINDING source m minimizes tot/w (t14's
    * C = min(n_s/w_s) in token space), every source's budget is
    * ⌊w_s · tot_m / w_m⌋ — integer arithmetic, so the oracle replays it
    * exactly — and the binding source is kept WHOLE (budget_m = tot_m),
    * t14's "keeps the binding source whole" law. Budgets are floors:
    * the crossing doc is kept, exactly p8's prefix rule. The ledger
    * adds (w, budget) so the blend is auditable per source.
    *
    * Scale shape: identical to p8 — the weight/budget attach is a
    * broadcast equi-join of a sources-sized frame, everything else is
    * the same two-level prefix sum and bucket-folded digest. */
  def p9WeightedMixture(spark: SparkSession, dir: String): DataFrame =
    mixtureSample(spark, dir, TextOps.sourceWeight(col("source")))
      .select(col("source"), col("w"), col("budget"),
        col("n_docs"), col("n_tok"),
        col("n_docs_sampled"), col("n_tok_sampled"), col("sample_md5"))
      .orderBy("source")

  /** p10 sampled-export: the full production export chain in one gate —
    * CURATE (p1/p4's funnel: eval holdout, quality, exact/near dedup,
    * decontamination), REBALANCE (p9's weighted token budgets over the
    * KEPT corpus — where a real pipeline samples: budgeting the raw
    * table would count tokens the funnel is about to drop), then PACK
    * (p4's (source, shard) geometry and content digest over the sampled
    * blend). Every stage reuses the exact code its standalone gate
    * verifies ([[stagedEligible]], [[sampleKeepFrame]], p4's pack
    * aggregation), so the composition is correct-by-construction
    * relative to the already-checked parts — and the oracle replays the
    * WHOLE chain in one statement (p4's funnel CTEs + p9's weight/
    * budget/prefix CTEs + p4's pack aggregation over the survivors).
    * Output schema is p4's exactly: a trainer-facing manifest of the
    * blended corpus.
    *
    * Scale shape: the funnel runs once (p4's proven non-corpus-sized
    * joins); the keep rule sees only the narrow (doc_id, source, n_tok)
    * stats of the kept set (text never enters the prefix-sum exchange);
    * the pack side re-reads token text by a doc_id equi-join of the
    * budget-sized sampled-id frame — tokenizing twice is the documented
    * price of never shuffling text through the sampler. One new
    * exchange vs p4: none — same (source, shard) packing partition,
    * ShardDocs-bounded buffers. */
  def p10SampledExport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
    val kept = stagedEligible(spark, dir, headFlags(docs))
      .filter(col("stage") === "kept")
      .select("doc_id", "source")
    val toks = tokenized(docs)
    val stats = kept.join(toks.select("doc_id", "n_tok"), Seq("doc_id"))
    val sampled = sampleKeepFrame(stats, TextOps.sourceWeight(col("source")))
      .filter(col("keep"))
      .select("doc_id", "source")
    packShards(sampled.join(toks, Seq("doc_id")))
  }

  /** The shared mixture-sample machinery (p8 = uniform `weightOf` 1,
    * p9 = t14's weight table): two-level prefix sum, largest-feasible
    * budgets, prefix keep rule, bucket-folded ledger digest. Returns
    * the full ledger including (w, budget); callers project. */
  private def mixtureSample(spark: SparkSession, dir: String,
                            weightOf: Column): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
    // the stats frame is the ONLY thing read more than once, so it is
    // cached: 4 narrow columns (no text) — at 100 TB the corpus scan +
    // tokenize runs ONCE and everything downstream reads tens of GB
    val stats = docs
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
    sampleLedger(sampleKeepFrame(stats, weightOf))
  }

  /** The per-source ledger over a keep-verdict frame
    * ([[sampleKeepFrame]]'s output) — shared by the batch gates
    * (p8/p9 via [[mixtureSample]]) and the streaming sampler's
    * per-batch re-derivation (p13), so the digest fold has exactly one
    * source. The digest folds through the SAME buckets as the prefix
    * sum: per-(source, bucket) kept-id sub-digests first (each buffer
    * ≈ kept/(sources·[[MixBuckets]]) ids, the 64-way-parallel bounded
    * aggregation), then one md5 over the bucket-ordered sub-digest
    * list per source (≤ [[MixBuckets]] fixed-width strings — the only
    * per-source buffer). A single per-source collect_list of kept ids
    * would be the one corpus-proportional aggregation buffer in the
    * repo: billions of ids in one executor's state at 100 TB. Bucket
    * ranges refine u order, so the two-level digest is as
    * deterministic and oracle-replayable as the flat one — the oracle
    * folds the identical shape in closed form. */
  private[graft] def sampleLedger(cum: DataFrame): DataFrame = {
    val perBucket = cum.groupBy("source", "bucket")
      .agg(
        first(col("w")).as("w"),
        first(col("budget")).as("budget"),
        count(lit(1)).as("b_docs"),
        sum("n_tok").as("b_tok"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("b_docs_sampled"),
        sum(when(col("keep"), col("n_tok")).otherwise(0L)).as("b_tok_sampled"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(when(col("keep"), struct(col("u"), col("doc_id"))))),
          x => x.getField("doc_id").cast("string")))).as("sub_md5"))
    perBucket.groupBy("source")
      .agg(
        first(col("w")).as("w"),
        first(col("budget")).as("budget"),
        sum("b_docs").as("n_docs"),
        sum("b_tok").as("n_tok"),
        sum("b_docs_sampled").as("n_docs_sampled"),
        sum("b_tok_sampled").as("n_tok_sampled"),
        // null, not md5(""), when a source samples ZERO docs (possible
        // when the binding source's tot_m < w_m floors every budget to
        // 0): the oracle's string_agg over all-NULL yields NULL, and
        // concat_ws over the empty collect_list would diverge to "".
        when(sum(col("b_docs_sampled")) > 0,
          md5(concat_ws(",", transform(
            array_sort(collect_list(when(col("b_docs_sampled") > 0,
              struct(col("bucket"), col("sub_md5"))))),
            x => x.getField("sub_md5"))))).as("sample_md5"))
  }

  /** The keep-rule half of the mixture sampler, over an ARBITRARY
    * narrow stats frame `(doc_id, source, n_tok)` — the seam p10 feeds
    * the CURATED corpus through (p8/p9 feed the raw table). Attaches
    * t14's preference hash + range bucket, derives the weight table and
    * largest-feasible budgets from the stats frame itself, runs the
    * two-level prefix sum, and returns every row with its `keep`
    * verdict (plus u/bucket/w/budget/cum for the callers' ledgers).
    * The input is cached here: every downstream read (bucket totals,
    * offsets, the cum join) re-reads it, and it is narrow by contract —
    * text must never enter this frame. */
  private[graft] def sampleKeepFrame(stats0: DataFrame,
                                     weightOf: Column): DataFrame =
    sampleKeepFrameCached(stats0, weightOf)._1

  /** [[sampleKeepFrame]] plus the internally-cached stats handle, so a
    * caller that re-derives the keep rule REPEATEDLY (p13's per-batch
    * loop) can unpersist each iteration's cache instead of accreting
    * one cached narrow corpus per batch in executor memory. */
  private[graft] def sampleKeepFrameCached(stats0: DataFrame,
                                           weightOf: Column): (DataFrame, DataFrame) = {
    val bucketWidth = TextOps.MixHashMod / MixBuckets
    val stats = stats0
      .withColumn("u", TextOps.mixHash(col("doc_id")))
      .withColumn("bucket", floor(col("u") / bucketWidth).cast("long"))
      .cache()
    // level 1: per-(source, bucket) totals — a sources × MixBuckets
    // frame, tiny; weights, the binding source, and every budget derive
    // from IT, not from another corpus scan
    val bucketTotals = stats.groupBy("source", "bucket")
      .agg(sum("n_tok").as("btok"))
    val totals = bucketTotals.groupBy("source").agg(sum("btok").as("tot"))
      .withColumn("w", weightOf)
    // largest feasible blend: the BINDING source m minimizes tot/w
    // (ties to the smallest source name — both engines sort the same
    // way); budget_s = ⌊w_s · tot_m / w_m⌋ in INTEGER arithmetic, so
    // budget_m = tot_m exactly (binding source kept whole) and
    // budget_s ≤ tot_s for every s (feasibility). The m-row attach is
    // the sanctioned single-row broadcast over the sources-sized
    // totals frame, never the corpus.
    val m = totals
      .orderBy((col("tot").cast("double") / col("w")).asc, col("source").asc)
      .limit(1).select(col("tot").as("tot_m"), col("w").as("w_m"))
    val budgets = totals.crossJoin(broadcast(m))
      .withColumn("budget", expr("(w * tot_m) div w_m"))
      .select("source", "w", "budget")
    // offset = cumsum of PRIOR buckets within the source
    val wBuckets = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("off", coalesce(sum("btok").over(wBuckets), lit(0L)))
      .select("source", "bucket", "off")
    // level 2: within-(source, bucket) running total in (u, doc_id)
    // order — bucket ranges refine u order, so off + within ≡ the
    // single-window prefix the oracle computes; the per-source budget
    // rides in on a broadcast equi-join of the sources-sized frame
    val wWithin = Window.partitionBy("source", "bucket").orderBy("u", "doc_id")
    val cum = stats.join(offsets, Seq("source", "bucket"))
      .withColumn("cum", col("off") + sum("n_tok").over(wWithin))
      .join(broadcast(budgets), Seq("source"))
      .withColumn("keep", col("cum") - col("n_tok") < col("budget"))
    (cum, stats)
  }

  /** p5 shuffle-shard: the TRAINING-ORDER export — p4 packs the kept
    * corpus in (source, doc_id) order, which is exactly the order a
    * trainer must NOT consume (consecutive docs correlate: same crawl,
    * same source, same day), so the step after packing is a global
    * shuffle into output shards. The permutation is t14's deterministic
    * multiplicative hash (`u = (doc_id mod 2³¹)·2654435761 mod 2³¹` —
    * pure 64-bit integer arithmetic, so ANY engine replays the exact
    * same order: no RNG state, resumable, and the oracle re-derives it
    * in closed form): a kept doc lands in shard `u mod OutShards` and
    * shards order internally by (u, doc_id). Per output shard: doc
    * count, DISTINCT SOURCE count (the interleaving evidence — a shard
    * of one source means the shuffle failed its purpose), token count,
    * sequence count in t13's geometry, and a sub-bucket-folded md5 of
    * the shard's packed token stream in hash order — the byte stream
    * the trainer reads, digested without a shard-sized buffer.
    *
    * Scale shape: no global sort and no global rank — shard assignment
    * is a narrow hash map (the 100 TB reason to hash-partition instead
    * of rank round-robin, which would need a total order over the
    * corpus), so the ONE exchange is the hash partition on `oshard`,
    * and each shard sorts only its own ≈ corpus/OutShards docs
    * in-partition. Source interleaving is `collect_set` — a single
    * aggregate, no count-distinct Expand doubling the text shuffle.
    * Funnel tail reuses p1's digest-keyed joins, proven non-corpus-
    * sized. */
  def p5ShuffleShard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
    val kept = stagedEligible(spark, dir, headFlags(docs))
      .filter(col("stage") === "kept")
      .select("doc_id", "source")
    shuffleShards(kept.join(tokenized(docs), Seq("doc_id")))
  }

  /** p15 sampled-shuffle: the LAST missing composition of the export
    * family — p10 ships the weighted blend in p4's (source, shard)
    * manifest geometry, but the bytes a trainer actually consumes are
    * that blend in TRAINING ORDER: curate (p1/p4's funnel) → rebalance
    * (p9's weighted token budgets over the kept corpus) → reshuffle
    * (p5's deterministic-hash permutation into output shards). Every
    * stage is the exact code its standalone gate verifies
    * ([[stagedEligible]], [[sampleKeepFrame]], [[shuffleShards]]), so
    * the composition is correct-by-construction relative to the
    * already-checked parts — and the oracle replays the whole chain in
    * one statement (p10's funnel + weight/budget/prefix CTEs feeding
    * p5's shard/fold aggregation).
    *
    * Scale shape: p10's exactly through the sampler (funnel once, keep
    * rule over narrow stats, text re-read by a budget-sized doc_id
    * equi-join), then p5's exactly for the reshuffle (narrow hash map
    * for shard assignment — no global sort or rank — one exchange on
    * `oshard`, sub-bucket-folded digests). Nothing new shuffles; the
    * gate exists to pin the COMPOSED digests, not a new plan. */
  def p15SampledShuffle(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
    val kept = stagedEligible(spark, dir, headFlags(docs))
      .filter(col("stage") === "kept")
      .select("doc_id", "source")
    val toks = tokenized(docs)
    val stats = kept.join(toks.select("doc_id", "n_tok"), Seq("doc_id"))
    val sampled = sampleKeepFrame(stats, TextOps.sourceWeight(col("source")))
      .filter(col("keep"))
      .select("doc_id", "source")
    shuffleShards(sampled.join(toks, Seq("doc_id")))
  }

  /** p5's training-order reshuffle over a `(doc_id, source, s, n_tok)`
    * frame — the one source for the permutation and the fold, shared by
    * p5 (the kept corpus) and p15 (the sampled blend), p4/p10's
    * [[packShards]] move on the shuffle geometry: an edit to the hash,
    * the shard rule, or the digest changes both gates together.
    *
    * pack_md5 folds through u-range sub-buckets exactly like p8's
    * sample digest: per-(oshard, sbucket) the packed text digests in
    * (u, doc_id) order (each buffer ≈ corpus/(OutShards·[[MixBuckets]])
    * docs), then the shard digest is one md5 over the bucket-ordered
    * sub-digest list (≤ [[MixBuckets]] fixed-width strings). A flat
    * per-oshard collect_list of full text would hold corpus/OutShards
    * DOCUMENTS in one aggregation buffer — with OutShards a handful,
    * the worst corpus-proportional state in the repo. Sub-bucket
    * ranges refine u order within the shard, so the fold preserves the
    * training-order semantics and the oracle replays it closed-form. */
  private def shuffleShards(docs: DataFrame): DataFrame = {
    val bucketWidth = TextOps.MixHashMod / MixBuckets
    docs
      .withColumn("u", TextOps.mixHash(col("doc_id")))
      .withColumn("oshard", (col("u") % OutShards).cast("long"))
      .withColumn("sbucket", floor(col("u") / bucketWidth).cast("long"))
      .groupBy("oshard", "sbucket")
      .agg(
        count(lit(1)).as("b_docs"),
        collect_set(col("source")).as("b_sources"),
        sum("n_tok").as("b_tok"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("u"), col("doc_id"), col("s")))),
          x => x.getField("s")))).as("sub_md5"))
      .groupBy("oshard")
      .agg(
        sum("b_docs").as("n_docs"),
        size(array_distinct(flatten(collect_list(col("b_sources"))))).cast("long").as("n_sources"),
        sum("b_tok").as("n_tok"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("sbucket"), col("sub_md5")))),
          x => x.getField("sub_md5")))).as("pack_md5"))
      .withColumn("n_seqs",
        floor((col("n_tok") + lit(TextOps.SeqTokens - 1)) / lit(TextOps.SeqTokens)).cast("long"))
      .select(col("oshard"), col("n_docs"), col("n_sources"), col("n_tok"),
        col("n_seqs"), col("pack_md5"))
      .orderBy("oshard")
  }
}
