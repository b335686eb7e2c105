package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.out.Canonical._

/** Deduplication operators over `documents` (LLM-pipeline suite):
  * exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: all variants are shuffle-on-key DataFrame plans.
  *  - exact: one hash aggregation on the normalized text (map-side
  *    partial dedup first).
  *  - n-gram Jaccard: inverted index on shingles (shuffle key = shingle),
  *    so only docs *sharing* a shingle ever meet — no O(n²) cross join.
  *  - MinHash+LSH: constant-size signature per doc (16 hashes → 4 bands),
  *    candidate pairs meet on band values; exact Jaccard verification only
  *    runs on candidates. At 100 TB this is the textbook near-dup plan.
  *  - SimHash: constant-size fingerprint per doc via one explode+agg.
  *
  * Determinism: hash functions derive from md5 hex digests (identical in
  * every engine); MinHash minima are exact 64-bit integer minima over
  * per-slot linear permutations of the shingle's 48-bit digest prefix, so
  * the DuckDB oracle can replay the exact same signatures.
  */
object DedupOps {

  /** Distinct (doc_id, shingle) pairs: word 3-grams of normalized tokens.
    * Dedup runs ARRAY-SIDE (`array_distinct` before the explode): because
    * doc_id is part of the key, global distinct ≡ per-doc distinct, so
    * the set is identical but the plan sheds a full Exchange of the
    * shingle stream — and this subtree is recomputed several times per
    * dedup query (see d2's plan notes), so the saving multiplies. */
  private[graft] def shingles(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
      ))).as("shingle"))

  /** Exact Jaccard for given candidate pairs (a_id < b_id). */
  private[graft] def jaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val s1 = sh.select(col("doc_id").as("a_id"), col("shingle"))
    val s2 = sh.select(col("doc_id").as("b_id"), col("shingle"))
    pairs
      .join(s1, "a_id").join(s2, Seq("b_id", "shingle"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .withColumn("jac", col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
  }

  /** d1 exact dedup: group on the md5 of the normalized text, keep the
    * smallest doc_id. Hashing the key means the shuffle moves 32-byte
    * digests instead of full document bodies — at 100 TB the group-by key
    * traffic is constant per row, not corpus-sized. (Grouping by a hash is
    * equivalent to grouping by the text itself up to md5 collisions.) */
  def d1Exact(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "documents")
      .groupBy(md5(TextOps.normText(col("text"))).as("norm_key"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .select("keep_id", "dup_cnt")
      .orderBy("keep_id")

  /** Candidate generation ignores shingles shared by more than this many
    * documents: a boilerplate 3-gram appearing in k docs would alone
    * create k²/2 candidate pairs. True near-dups (J ≥ 0.5) share many
    * shingles, so dropping the frequent ones from *candidate generation
    * only* (verification still uses every shingle) loses a pair only if
    * ALL of its shared shingles are corpus-frequent. */
  val MaxShingleDf = 100

  /** d2 n-gram Jaccard near-dup: pairs with J ≥ 0.5 via the shingle
    * inverted index, document-frequency-capped (the oracle mirrors the
    * same cap, so the output is exactly reproducible).
    *
    * Plan notes for scale: a pair is a candidate iff it shares a *rare*
    * (df ≤ cap) shingle, and its intersection decomposes as
    * i = i_rare + i_freq, each computed as a groupBy over its own bounded
    * self-join — the naive candidates⋈shingles⋈shingles verify would
    * explode to |pairs| × |shingles/doc| rows (~50 M at sf0.1). The rare
    * side is bounded by the df cap (≤ cap·df per shingle), the frequent
    * side by the frequent-shingle count (a tiny tail by definition).
    * The shingle subtree is referenced five times and deliberately NOT
    * persisted: recomputing a narrow scan+explode is cheaper than the
    * cache, and a persisted subtree here gets substituted (by canonical-
    * plan matching) into d3's plans, wrecking their join selection. */
  def d2NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(Sources.table(spark, dir, "documents"))
    val dfs = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val rare = sh.join(dfs.filter(col("df") <= MaxShingleDf).select("shingle"), "shingle")
    val freq = sh.join(dfs.filter(col("df") > MaxShingleDf).select("shingle"), "shingle")
    val iRare = rare.as("x").join(rare.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("i_rare"))
    // frequent-shingle intersections are counted by joining the (already
    // rare-bounded) candidate pairs onto the frequent postings — a freq
    // self-join would recreate the very k² blow-up the df cap exists to
    // prevent (one boilerplate shingle in k docs → k²/2 rows)
    val iFreq = iRare.select("a_id", "b_id")
      .join(freq.select(col("doc_id").as("a_id"), col("shingle")), "a_id")
      .join(freq.select(col("doc_id").as("b_id"), col("shingle")), Seq("b_id", "shingle"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("i_freq"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    iRare
      .join(iFreq, Seq("a_id", "b_id"), "left")
      .withColumn("i", col("i_rare") + coalesce(col("i_freq"), lit(0L)))
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .withColumn("jac", col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
      .filter(col("jac") >= 0.5)
      .select(col("a_id"), col("b_id"), r4(col("jac")).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  val MinhashK = 16
  val Bands = 4 // 4 rows per band

  /** Modulus (the Mersenne prime 2^31−1) and per-slot coefficients for
    * the MinhashK linear permutations h_j(x) = (A_j·x + B_j) mod P.
    * Fixed literals (seeded once, hardcoded) so the oracle replays the
    * identical family; A_j < 2^14 keeps A_j·x + B_j < 2^63 for 48-bit x,
    * i.e. exact 64-bit integer arithmetic in every engine. */
  val MinhashP = 2147483647L
  val MinhashA: Seq[Long] = Seq(5307L, 15531L, 2473L, 6469L, 10665L, 793L,
    1187L, 13457L, 8781L, 1543L, 5993L, 9549L, 951L, 14905L, 8315L, 3519L)
  val MinhashB: Seq[Long] = Seq(80521324L, 184570285L, 931247021L,
    898017869L, 150013383L, 516819858L, 194804716L, 1183364967L,
    911648019L, 126938843L, 1775651415L, 1214302567L, 265862673L,
    2034632750L, 479402028L, 1354258844L)

  /** MinHash signature from ONE digest per shingle: x is the shingle's
    * 48-bit md5 prefix, and the j-th hash is the linear permutation
    * h_j(x) = (A_j·x + B_j) mod P with per-slot constants — the classic
    * cheap minhash family. One md5 instead of MinhashK per shingle
    * occurrence (the dedup CPU hot spot at corpus scale; d3 −30%
    * end-to-end at sf0.1) at unchanged candidate selectivity. The naive
    * shortcut h_j = a + j·b is NOT used: its slots are so correlated that
    * one shared min-a shingle matches whole bands, collapsing band
    * collision probability from J^rows to ≈J (measured 50× candidate
    * blow-up). Per-slot coefficients keep the argmin shingle independent
    * across slots. */
  private def signatures(sh: DataFrame): DataFrame = {
    val x = conv(substring(md5(col("shingle")), 1, 12), 16, 10).cast("long")
    sh.select(col("doc_id"), x.as("x"))
      .groupBy("doc_id").agg(
        min((col("x") * MinhashA(0) + MinhashB(0)) % MinhashP).as("h0"),
        (1 until MinhashK).map(j =>
          min((col("x") * MinhashA(j) + MinhashB(j)) % MinhashP).as(s"h$j")): _*)
  }

  /** d3 MinHash+LSH near-dup: banded candidate generation + exact verify
    * at J ≥ 0.7. Output = LSH candidates that verify (the oracle replays
    * the identical signature/band construction, so approximation error is
    * itself deterministic). */
  /** LSH candidate pairs (a_id < b_id) from banded MinHash signatures —
    * the shared candidate stage of d3 (Jaccard verify) and d7 (edit-
    * distance verify). Candidates meet on (band index, band value), so
    * generation is an equi-join, never all-pairs. */
  /** Banded MinHash signature rows (doc_id, bi, bv) — the per-doc
    * constant-size index entries LSH candidates meet on. Factored out so
    * the streaming incremental dedup (d12) can append exactly these rows
    * to its persisted band store. */
  private[graft] def bandRows(sh: DataFrame): DataFrame = {
    val sig = signatures(sh)
    val rows = MinhashK / Bands
    val bandCols = (0 until Bands).map { b =>
      struct(lit(b).as("bi"),
        md5(concat_ws("|",
          (b * rows until (b + 1) * rows).map(j => col(s"h$j").cast("string")): _*)).as("bv"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.bi"), col("band.bv"))
  }

  private def lshCandidates(sh: DataFrame): DataFrame = {
    val bands = bandRows(sh)
    bands.as("x").join(bands.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  def d3MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(Sources.table(spark, dir, "documents"))
    val cand = lshCandidates(sh)
    jaccard(cand, sh)
      .filter(col("jac") >= 0.7)
      .select(col("a_id"), col("b_id"), r4(col("jac")).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** Iteration cap for [[connectedComponents]]: the alternating
    * large-star/small-star rounds converge in O(log n) rounds in
    * practice (O(log² n) proven; Kiveris et al., "Connected Components
    * in MapReduce and Beyond", SoCC 2014), so 32 rounds cover components
    * of ~2³² nodes — far beyond any single dup cluster. The guard FAILS
    * LOUDLY (require) rather than emitting a partial clustering — a
    * silent partial would under-drop dups downstream. */
  val MaxClusterIters = 32

  /** Distributed connected components over an undirected edge list via
    * alternating large-star / small-star contractions (Kiveris et al.,
    * SoCC 2014). Input: pair rows (a, b), any orientation, self-loops
    * ignored. Output: one row per node appearing in any edge —
    * (id, lbl) with lbl = the smallest node id in its component.
    *
    * Each round rewires edges toward per-neighbourhood minima:
    * large-star hangs every larger neighbour of u under
    * min(Γ(u) ∪ {u}); small-star then re-hangs u and its smaller
    * neighbours under the same min. Both steps preserve connectivity
    * and strictly shrink path lengths geometrically, so rounds scale
    * with log(component size), NOT diameter — a 10⁶-doc chained
    * cluster (each doc similar only to its neighbours, the templated-
    * page pathology) converges in ~20 rounds where naive min-label
    * propagation needs 10⁶.
    *
    * Scale design: every step is a groupBy-min + an equi-join on the
    * SAME grouping key over pair-sized rows (never corpus-sized), so
    * each round is one hash shuffle of the current edge set;
    * `localCheckpoint` truncates lineage per round (a reliable
    * `checkpoint` does the same on a cluster). Convergence = exact edge-
    * set fixpoint (two except-counts over the contracted star edges —
    * tiny by the time it matters); the alternating fixpoint IS the
    * star graph node→component-min, so no label table is carried
    * between rounds at all. */
  private[graft] def connectedComponents(pairs: DataFrame): DataFrame = {
    // directed high→low (u > v), deduped; the invariant every round below
    // preserves: large-star emits (bigger, min) and small-star re-emits
    // (node, min) with node > min, so edges stay canonically oriented
    var edges = pairs.toDF("a", "b")
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    var converged = edges.isEmpty
    var iters = 0
    while (!converged && iters < MaxClusterIters) {
      // large-star: per node u over its full neighbourhood (both
      // orientations), m = min(Γ(u) ∪ {u}); hang each larger neighbour
      // on m. Strictly-larger keeps orientation and drops nothing: the
      // (smaller, m) links are small-star's job.
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = sym.join(lsMin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star: per node u over its smaller neighbours (ls is
      // already high→low), m = min; re-hang u and every non-min
      // neighbour directly on m — the contraction that flattens chains
      val ssMin = ls.groupBy("u").agg(min("v").as("m"))
      val ss = ls.join(ssMin, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint()
      // exact fixpoint: the round changed nothing ⟺ edge sets equal
      // (both sides distinct, so one except + a count comparison suffice)
      converged = ss.count() == edges.count() && ss.except(edges).isEmpty
      edges = ss
      iters += 1
    }
    require(converged, s"connectedComponents did not converge in $MaxClusterIters rounds")
    // fixpoint is a star forest: every non-min node points straight at
    // its component min; the min itself labels itself
    edges.select(col("u").as("id"), col("v").as("lbl"))
      .union(edges.select(col("v")).distinct()
        .select(col("v").as("id"), col("v").as("lbl")))
  }

  /** d10 near-dup clustering — the step after pair generation that every
    * dedup pipeline actually ships: d3's verified pairs (J ≥ 0.7) are an
    * edge list, and "keep one per cluster" needs its connected
    * components. Each clustered doc gets cluster_id = the smallest
    * doc_id reachable through near-dup edges (the canonical survivor)
    * plus the component size; docs in no pair are not emitted (their
    * cluster is trivially themselves).
    *
    * The fixpoint engine is [[connectedComponents]] (alternating
    * large-star/small-star) — log-round convergence regardless of
    * component diameter, so chained clusters (templated pages, each
    * similar only to its neighbours) no longer threaten the iteration
    * cap the way they did under min-label propagation. */
  def d10DupClusters(spark: SparkSession, dir: String): DataFrame = {
    val labels = dupClusterLabels(spark, dir)
    val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** d10's cluster-label map WITHOUT the size attach or the output
    * sort — the shape the funnel gates (p1/p4/p5/p10/p15 via
    * [[PipelineOps.stagedEligible]]) actually consume: they only ask
    * "is this doc a non-representative cluster member"
    * (cluster_id ≠ doc_id), so joining the full d10 gate output made
    * every funnel pay a cluster-size aggregation + join + global sort
    * whose columns the very next projection discarded (guide §1.2:
    * don't compute what you throw away). d10's own gate output is
    * unchanged — it layers the size/sort on top of this map. */
  private[graft] def dupClusterLabels(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(Sources.table(spark, dir, "documents"))
    val pairs = jaccard(lshCandidates(sh), sh)
      .filter(col("jac") >= 0.7).select("a_id", "b_id")
    connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
  }

  /** d7 edit-distance near-dup: the fuzzy-dedup modality Jaccard misses
    * (shingle overlap is blind to dense single-character noise; edit
    * distance is the typo/ocr-error metric). Same LSH candidate stage as
    * d3, then `levenshtein` verified on *candidates only* — the O(len²)
    * kernel never runs on the n² pair space. The threshold
    * `dist·5 ≤ max(len)` (≤20% of the longer text) is pure integer
    * arithmetic, so both engines agree by construction. */
  def d7EditDistance(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
    val cand = lshCandidates(shingles(docs))
    val na = docs.select(col("doc_id").as("a_id"), TextOps.normText(col("text")).as("ta"))
    val nb = docs.select(col("doc_id").as("b_id"), TextOps.normText(col("text")).as("tb"))
    cand.join(na, "a_id").join(nb, "b_id")
      .withColumn("dist", levenshtein(col("ta"), col("tb")).cast("long"))
      .filter(col("dist") * 5 <= greatest(length(col("ta")), length(col("tb"))))
      .select("a_id", "b_id", "dist")
      .orderBy("a_id", "b_id")
  }

  /** d8's held-out "benchmark" membership: every EvalMod-th doc_id plays
    * the eval set (deterministic, so the oracle replays it). */
  val EvalMod = 10

  /** d8 benchmark decontamination: training docs sharing any word 5-gram
    * with the held-out eval set — the test-set-overlap sweep every
    * pretraining pipeline runs before training. Per contaminated doc:
    * how many eval docs it collides with and on how many distinct grams.
    *
    * Scale design: the eval/benchmark side is tiny by nature (MBs of
    * benchmarks vs a 100 TB corpus), so its distinct 5-gram set is
    * BROADCAST and the train side never shuffles for the join — one
    * narrow scan + broadcast hash join + one aggregation exchange on
    * doc_id. Grams are md5'd (d1's trick) so the join key is a fixed
    * 32-byte digest, not sliding windows of document text; per-doc
    * `array_distinct` runs array-side before the explode. */
  def d8Decontamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
    def grams(df: DataFrame): DataFrame = TextOps.gram5(df, col("doc_id"))
    val evalG = grams(docs.filter(col("doc_id") % EvalMod === 0))
      .select(col("doc_id").as("eval_id"), col("g"))
    val trainG = grams(docs.filter(col("doc_id") % EvalMod =!= 0))
    trainG.join(broadcast(evalG), "g")
      .groupBy("doc_id")
      .agg(
        countDistinct(col("eval_id")).as("n_eval_docs"),
        countDistinct(col("g")).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  /** d8's contaminated-doc ID SET — the membership shape the funnel
    * gates consume ([[PipelineOps.stagedEligible]] only asks "is this
    * doc contaminated"), so the per-doc eval-doc/gram count-distincts
    * (a two-column Expand that doubles the joined gram stream through
    * the aggregation) and d8's output sort are skipped, and the
    * broadcast ships DISTINCT grams instead of (eval_id, gram) pairs.
    * Same membership by construction: a doc is contaminated iff it
    * shares ≥ 1 five-gram with the eval side. d8's own gate output is
    * unchanged. */
  private[graft] def contaminatedIds(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
    val evalG = TextOps.gram5(docs.filter(col("doc_id") % EvalMod === 0), col("doc_id"))
      .select("g").distinct()
    TextOps.gram5(docs.filter(col("doc_id") % EvalMod =!= 0), col("doc_id"))
      .join(broadcast(evalG), "g")
      .select("doc_id").distinct()
  }

  /** d14's prefilter false-positive rate. Verification is exact, so fpp
    * trades only wasted verify-join traffic, never correctness — it can
    * be relaxed (bits ∝ ln(1/fpp)) if the filter must shrink further. */
  val BloomFpp = 0.01

  /** d14's declared eval-gram capacity. Sizing is a CONFIG, not a
    * measured count — the filter is built in the same aggregation pass
    * that scans the eval grams, with no sizing `count()` pass ahead of
    * it. Overflowing the capacity only degrades prefilter selectivity
    * (fpp drifts above [[BloomFpp]]); the exact verify join keeps the
    * output correct regardless. */
  val BloomCapacity: Long = 1L << 20

  /** Optimal bit count for [[BloomCapacity]] items at [[BloomFpp]]:
    * n·ln(1/fpp)/ln²2 ≈ 9.59 bits/item → ~1.2 MB. */
  val BloomNumBits: Long =
    math.ceil(BloomCapacity * math.log(1 / BloomFpp) / (math.log(2) * math.log(2))).toLong

  /** d14 bloom-prefiltered decontamination: d8's exact answer, computed
    * the way it survives an eval side too big to broadcast as an exact
    * set. d8 ships every distinct eval 5-gram digest to every executor —
    * fine for MB-scale benchmarks, but the eval suite grows with every
    * benchmark added (32 bytes × 100M grams = 3.2 GB, past broadcast
    * comfort). Here the eval side travels as a fixed-fpp Bloom filter
    * (~1.2 GB per *billion* grams at 1%), the train grams are prefiltered
    * through it in a narrow map that kills ≥ 99% of them (true overlap is
    * rare by construction — that is the point of decontamination), and
    * only the tiny surviving stream pays an exact equi-join against the
    * eval gram table, which drops the filter's false positives before
    * they can reach the output. Output ≡ d8, same oracle.
    *
    * Scale notes: the bloom build is `bloom_filter_agg` — a distributed
    * aggregation over the eval grams (partial bitsets OR-merged), sized
    * by the declared capacity/fpp config with NO driver-side sizing pass
    * or driver-built sketch; the prefilter is Spark's native
    * `might_contain` expression probing the filter as a scalar subquery
    * (the same machinery AQE's runtime bloom-join injection uses), so
    * the probe stays inside whole-stage codegen — no per-row virtual
    * UDF call. Grams probe as `xxhash64` longs; a 64-bit hash collision
    * is just one more false positive, which the exact verify join drops.
    * The verify join shuffles only prefilter survivors. */
  def d14BloomDecontamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
    val evalG = TextOps.gram5(docs.filter(col("doc_id") % EvalMod === 0), col("doc_id"))
      .select(col("doc_id").as("eval_id"), col("g"))
    // `might_contain` needs its filter as a scalar subquery, which only a
    // catalog name can express — use a per-invocation unique view so
    // concurrent calls on one session can't cross-wire filters, and drop
    // it once analysis has bound the subquery plan (Datasets analyze
    // eagerly, so the returned frame no longer needs the catalog entry).
    val bloomView = uniqueViewName("graft_d14_bloom")
    evalG
      .agg(expr(s"bloom_filter_agg(xxhash64(g), ${BloomCapacity}L, ${BloomNumBits}L)").as("bf"))
      .createOrReplaceTempView(bloomView)
    try {
      TextOps.gram5(docs.filter(col("doc_id") % EvalMod =!= 0), col("doc_id"))
        .filter(expr(s"might_contain((select bf from $bloomView), xxhash64(g))"))
        .join(evalG, "g")
        .groupBy("doc_id")
        .agg(
          countDistinct(col("eval_id")).as("n_eval_docs"),
          countDistinct(col("g")).as("n_shared_grams"))
        .orderBy("doc_id")
    } finally { spark.catalog.dropTempView(bloomView); () }
  }

  /** Catalog-safe unique temp-view name for scalar-subquery plumbing. */
  private[graft] def uniqueViewName(prefix: String): String =
    s"${prefix}_${java.util.UUID.randomUUID().toString.replace("-", "")}"

  val SimhashBits = 32

  /** Per-doc SimHash bit votes s_0..s_31: each token's md5 contributes
    * +1/−1 to bit i by its i-th hash bit; one explode + one aggregation.
    * Shared by d4 (fingerprint emission) and d9 (near-dup pairing). */
  private def simhashSums(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
      .withColumn("h", md5(col("t")))
    val bitSums: Seq[Column] = (0 until SimhashBits).map { i =>
      val v = conv(substring(col("h"), 1 + i / 4, 1), 16, 10).cast("int")
      val bit = shiftright(v, 3 - i % 4).bitwiseAND(lit(1))
      sum(bit * 2 - 1).as(s"s$i")
    }
    tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
  }

  /** d4 SimHash fingerprint: 32-bit signature from md5 nibbles of each
    * token occurrence (bit i weight: +1/-1 by hash bit, summed per doc). */
  def d4Simhash(spark: SparkSession, dir: String): DataFrame =
    simhashSums(Sources.table(spark, dir, "documents"))
      .select(col("doc_id"),
        concat((0 until SimhashBits).map(i =>
          when(col(s"s$i") >= 0, "1").otherwise("0")): _*).as("simhash"))
      .orderBy("doc_id")

  /** d9's Hamming radius: pairs within this many differing fingerprint
    * bits count as near-dups. */
  val SimhashMaxDist = 3

  /** d9 SimHash near-dup pairing — the search-engine dedup method: docs
    * whose 32-bit SimHash fingerprints differ in ≤ [[SimhashMaxDist]]
    * bits, with candidates generated by byte-banding the fingerprint.
    * Unlike MinHash banding this candidate stage is EXACT, not
    * probabilistic: ≤ 3 differing bits spread over 4 disjoint bytes
    * leave at least one byte identical (pigeonhole), so every qualifying
    * pair collides in some band and the output is complete by
    * construction. Verification is one codegen'd `bit_count(xor)` per
    * candidate — integer-exact in every engine.
    *
    * Scale notes: candidates meet on (band index, band value) — an
    * equi-join, never all-pairs; the verify kernel is O(1) per pair. At
    * corpus scale the fingerprint widens to 64 bits with 16-bit bands
    * (same plan, different constants) so band buckets stay sparse; 32/8
    * here mirrors d4 so the oracle replays identical fingerprints. */
  def d9SimhashNearDup(spark: SparkSession, dir: String): DataFrame = {
    val fp = simhashSums(Sources.table(spark, dir, "documents"))
      .select(col("doc_id"),
        (0 until SimhashBits).map(i =>
          when(col(s"s$i") >= 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _).as("fp"))
    val bands = fp.select(col("doc_id"), col("fp"),
        explode(array((0 until SimhashBits / 8).map(b =>
          struct(lit(b).as("bi"),
            shiftright(col("fp"), 8 * b).bitwiseAND(lit(255L)).as("bv"))): _*)).as("band"))
      .select(col("doc_id"), col("fp"), col("band.bi"), col("band.bv"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("x.fp").as("fa"),
        col("y.doc_id").as("b_id"), col("y.fp").as("fb"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
      .filter(col("hamming") <= SimhashMaxDist)
      .select("a_id", "b_id", "hamming")
      .orderBy("a_id", "b_id")
  }

  /** d13 consensus near-dup: one pair ledger across modalities — d3's
    * text pairs (MinHash-LSH, J ≥ 0.7) full-outer-joined with d5's
    * embedding pairs (sign-LSH, cos ≥ 0.4), each pair tagged with its
    * provenance (`both` / `text` / `embedding`). This is the review
    * table a dedup owner actually triages: `both` is safe to drop,
    * single-modality pairs are where text dedup misses semantic dups
    * (and vice versa). Absent scores surface as −1.0 sentinels, not
    * NULLs, so the ledger hashes deterministically.
    *
    * Scale design: both pair generators are the already-bounded LSH
    * plans; the consensus join shuffles only pair-sized rows on the
    * (a_id, b_id) key. Nothing corpus-sized moves. */
  def d13ConsensusNearDup(spark: SparkSession, dir: String): DataFrame = {
    val text = d3MinhashLsh(spark, dir)
    val embed = SimilarityOps.d5EmbedNearDup(spark, dir)
    text.join(embed, Seq("a_id", "b_id"), "full_outer")
      .select(col("a_id"), col("b_id"),
        when(col("jaccard").isNotNull && col("cos_sim").isNotNull, "both")
          .when(col("jaccard").isNotNull, "text")
          .otherwise("embedding").as("modality"),
        coalesce(col("jaccard"), lit(-1.0)).as("jaccard"),
        coalesce(col("cos_sim"), lit(-1.0)).as("cos_sim"))
      .orderBy("a_id", "b_id")
  }

  /** d11 dedup impact report — the ledger a pipeline owner reads before
    * committing a dedup pass: per (lang, source), how many docs exist,
    * how many sit in a near-dup cluster, how many the keep-one-per-
    * cluster policy (keep = the cluster's min doc_id, d10's canonical
    * survivor) would drop, and how many survive.
    *
    * Scale design: the cluster table is NOT assumed small. At heavy dup
    * rates (web crawls commonly put 30-50% of docs in near-dup clusters)
    * cluster membership is corpus-fraction-sized — billions of rows at
    * 100 TB — so a forced broadcast would OOM the driver. The join is
    * therefore left unhinted: AQE picks a broadcast when the cluster
    * side measures small at runtime (it does at fixture scale) and falls
    * back to a shuffle-on-doc_id sort-merge join otherwise — the same
    * single doc_id exchange d10 already pays per propagation round; one
    * (lang × source)-keyed aggregation follows. The expensive part
    * (pair generation + clustering) is d10, already bounded. */
  def d11DedupImpact(spark: SparkSession, dir: String): DataFrame = {
    val clusters = d10DupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    Sources.table(spark, dir, "documents")
      .join(clusters, Seq("doc_id"), "left")
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("cluster_id").isNotNull, 1L).otherwise(0L)).as("n_clustered"),
        sum(when(col("cluster_id").isNotNull && col("cluster_id") =!= col("doc_id"), 1L)
          .otherwise(0L)).as("n_dropped"))
      .withColumn("n_kept", col("n_docs") - col("n_dropped"))
      .orderBy("lang", "source")
  }
}
