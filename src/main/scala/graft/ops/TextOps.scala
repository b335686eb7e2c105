package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.out.Canonical._

/** Text-analysis operators over the `documents` table (SURVEY.md §2.4
  * Q20–Q21 + the LLM-pipeline text suite: language-ID, quality scoring,
  * token counting, fingerprinting).
  *
  * Everything is built from codegen'd `functions._` expressions — no UDFs
  * — so the scan stays inside whole-stage codegen and scales linearly:
  * each query is a narrow map over documents followed by (at most) one
  * aggregation exchange.
  */
object TextOps {

  /** Lower-cased alphanumeric tokens; shared by text + dedup ops. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= lit(""))

  /** Whitespace-squeezed, lower-cased canonical text for exact dedup. */
  def normText(c: Column): Column =
    trim(lower(regexp_replace(c, "\\s+", " ")))

  /** Distinct word-5-gram digests per row, keyed by `keys` — the overlap
    * unit shared by d8 (per train/eval doc) and t15 (per source). One
    * narrow map per document: tokenize, window, digest, array-side
    * dedup, then a single explode. */
  private[graft] def gram5(df: DataFrame, keys: Column*): DataFrame = df
    .withColumn("ts", tokens(col("text")))
    .filter(size(col("ts")) >= 5)
    .select(keys :+ explode(array_distinct(transform(
      sequence(lit(0), size(col("ts")) - 5),
      i => md5(concat_ws(" ",
        col("ts")(i), col("ts")(i + 1), col("ts")(i + 2),
        col("ts")(i + 3), col("ts")(i + 4)))))).as("g"): _*)

  /** Q20 text-dedup: docs per (lang, source) before/after normalization. */
  def q20TextDedup(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "documents")
      .withColumn("norm", normText(col("text")))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("norm")).as("n_uniq"))
      .orderBy("lang", "source")

  /** Q21 token-stats: top-20 tokens across the corpus.
    * explode→partial-count→final-count: the heavy dedup happens map-side. */
  def q21TokenStats(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "documents")
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  // Language-ID stopword patterns (tiny n-gram heuristic; deterministic).
  val langPatterns: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in)\\b",
    "es" -> "\\b(el|la|de|que|y)\\b",
    "de" -> "\\b(der|die|und|das|ist)\\b",
    "fr" -> "\\b(le|la|et|les|des)\\b")

  private def stopHits(c: Column, pattern: String): Column =
    size(regexp_extract_all(lower(c), lit(pattern), lit(0)))

  /** t1 language-ID: stopword-hit voting with a fixed priority order. */
  def t1LangId(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
    val scored = langPatterns.foldLeft(docs) { case (df, (l, p)) =>
      df.withColumn(s"s_$l", stopHits(col("text"), p))
    }
    scored.select(
      col("doc_id"),
      when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") &&
           col("s_en") >= col("s_fr") && col("s_en") > 0, "en")
        .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr") &&
              col("s_es") > 0, "es")
        .when(col("s_de") >= col("s_fr") && col("s_de") > 0, "de")
        .when(col("s_fr") > 0, "fr")
        .otherwise("und").as("pred_lang"))
      .orderBy("doc_id")
  }

  /** t2 quality scoring: length / punctuation / stopword signals.
    * Zero-token docs are excluded (identically in the oracle) — every
    * ratio here divides by the token count. */
  def t2Quality(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .filter(col("n_tok") > 0)
      .withColumn("sum_len",
        aggregate(transform(col("toks"), t => length(t)), lit(0), (a, x) => a + x))
      .withColumn("n_punct",
        size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))))
      .withColumn("n_stop", stopHits(col("text"), "\\b(the|and|of|to|in|a|is)\\b"))
      .select(
        col("doc_id"),
        col("n_tok"),
        r4(col("sum_len").cast("double") / col("n_tok").cast("double")).as("avg_tok_len"),
        r4(col("n_punct").cast("double") / length(col("text")).cast("double")).as("punct_ratio"),
        r4(col("n_stop").cast("double") / col("n_tok").cast("double")).as("stop_ratio"),
        r4(least(col("n_tok").cast("double") / 200.0, lit(1.0)) * 0.5
          + (col("n_stop").cast("double") / col("n_tok").cast("double")) * 0.3
          + (lit(1.0) - col("n_punct").cast("double") / length(col("text")).cast("double")) * 0.2
        ).as("quality"))
      .orderBy("doc_id")

  /** t3 token counting: whitespace tokens + a BPE-ish regex tokenizer. */
  def t3TokenCount(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(filter(split(col("text"), "\\s+"), t => t =!= lit("")))
          .cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
          .cast("long").as("bpe_tokens"))
      .orderBy("doc_id")

  // Redaction patterns (RE2-safe so DuckDB replays them identically).
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumRe = "[0-9]{6,}"

  /** t5 redaction: scrub email addresses then long digit runs (order
    * matters — emails contain digits), count both, and emit the md5 of
    * the redacted text. The compliance-scrub shape of a training-data
    * pipeline: a narrow codegen'd map, no shuffle before the output sort. */
  def t5Redact(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "documents")
      .withColumn("n_emails",
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_longnums",
        size(regexp_extract_all(col("text"), lit(LongNumRe), lit(0))).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"), LongNumRe, "<NUM>"))
      .select(col("doc_id"), col("n_emails"), col("n_longnums"),
        md5(col("redacted")).as("redacted_md5"))
      .orderBy("doc_id")

  /** Count-min sketch geometry: d hash rows × 256 buckets (bucket =
    * first byte of md5("<r>|<token>")). */
  val CmsDepth = 4

  private[graft] def cmsBucket(r: Int, token: Column): Column =
    conv(substring(md5(concat_ws("|", lit(r), token)), 1, 2), 16, 10).cast("long")

  /** t6 count-min-sketch heavy hitters: estimate the top-20 token counts
    * from a d×256 CMS and report them next to the exact counts
    * (cms_est ≥ cnt always; equality when no bucket collisions).
    *
    * The sketch is composed as a DataFrame plan rather than a custom
    * aggregate: counters are one groupBy over (row, bucket) — a
    * fixed-width (d·256-cell) table regardless of corpus size, which is
    * the whole point of sketching at 100 TB. Hashing is md5-byte based so
    * the oracle rebuilds the identical sketch. */
  def t6CmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val tokCounts = Sources.table(spark, dir, "documents")
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val hashed = tokCounts.select(col("token"), col("cnt"),
        explode(array((0 until CmsDepth).map(r =>
          struct(lit(r).as("r"), cmsBucket(r, col("token")).as("bucket"))): _*)).as("h"))
      .select(col("token"), col("cnt"), col("h.r"), col("h.bucket"))
    val counters = hashed.groupBy("r", "bucket").agg(sum("cnt").as("c"))
    val top = tokCounts.orderBy(col("cnt").desc, col("token")).limit(20)
    top.join(hashed.select("token", "r", "bucket"), "token")
      .join(counters, Seq("r", "bucket"))
      .groupBy("token", "cnt").agg(min("c").as("cms_est"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** t4 document fingerprint: min-hash over word 5-grams (winnowing-style
    * content signature; robust to reordering of distant parts). */
  def t4Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .withColumn("fp",
        when(size(col("toks")) >= 5,
          array_min(transform(
            sequence(lit(0), size(col("toks")) - 5),
            i => md5(concat_ws(" ",
              col("toks")(i), col("toks")(i + 1), col("toks")(i + 2),
              col("toks")(i + 3), col("toks")(i + 4))))))
          .otherwise(md5(concat_ws(" ", col("toks")))))
      .select("doc_id", "fp")
      .orderBy("doc_id")

  /** t8 intra-document repetition: duplicate word-trigram ratio per doc —
    * the repetition-quality rule of a pretraining pipeline (template spam,
    * keyword stuffing, and decode loops all show up as a high ratio;
    * published corpus-cleaning recipes filter on exactly this family of
    * signals). Trigram list, its distinct form, and the ratio are all
    * computed array-side (`transform` + `array_distinct`), so the whole
    * signal is one codegen'd narrow map per document — no explode, no
    * shuffle before the output sort, linear at any corpus size. */
  def t8Repetition(spark: SparkSession, dir: String): DataFrame = {
    val tri = transform(
      sequence(lit(0), size(col("ts")) - 3),
      i => concat_ws(" ", col("ts")(i), col("ts")(i + 1), col("ts")(i + 2)))
    Sources.table(spark, dir, "documents")
      .withColumn("ts", tokens(col("text")))
      .filter(size(col("ts")) >= 3)
      .withColumn("tri", tri)
      .select(
        col("doc_id"),
        size(col("tri")).cast("long").as("n_tri"),
        size(array_distinct(col("tri"))).cast("long").as("n_uniq_tri"),
        r4(lit(1.0) - size(array_distinct(col("tri"))).cast("double")
          / size(col("tri")).cast("double")).as("dup_ratio"))
      .orderBy("doc_id")
  }

  /** t9 distinctive terms: top-3 terms per document scored tf/df — the
    * tf-idf-family keyword extractor of a corpus pipeline (topic tagging,
    * index keys, boilerplate spotting). The idf factor is 1/df rather
    * than ln(N/df) deliberately: a lone IEEE division of two integers is
    * bit-identical in every engine, while transcendental ln is not
    * guaranteed reproducible across math libraries — so ranking and
    * oracle hashes stay exact with no tolerance band.
    *
    * Scale shape: one shuffle to (doc, term) counts, a term-keyed
    * aggregate for document frequencies (vocabulary-sized, shrinks with
    * Zipf), a join back on term, and a per-doc top-k window — each keyed
    * move on a bounded or heavily-reduced set, never on raw token
    * occurrences twice. */
  def t9TopTerms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tc = Sources.table(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfs = tc.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token"))
    tc.join(dfs, "token")
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        r4(col("score")).as("score"), col("rnk"))
      .orderBy("doc_id", "rnk")
  }

  /** t10's rule thresholds — all integer-exact so both engines agree by
    * construction (no float tolerance anywhere in the rule battery):
    * wc ≥ MinWords; mean token length in [4.2, 5.2] checked as
    * 10·Σlen ∈ [42·wc, 52·wc]; ≥ MinStops stopword occurrences; top
    * token share ≤ 1/8 checked as 8·max_run ≤ wc. */
  val MinWords = 30
  val MinStops = 2
  val StopList: Seq[String] = Seq("the", "a", "of", "to", "in", "and", "is")

  /** Highest single-token occurrence count in a token-array column,
    * computed as the longest run in the SORTED array via one codegen'd
    * fold — no explode, no shuffle (t10's dominance rule; property-
    * tested against brute-force counting in InvariantSpec). */
  def maxTokenRun(tokArrayCol: String): Column = expr(
    s"""aggregate(array_sort($tokArrayCol),
       |  named_struct('prev', '', 'run', 0L, 'best', 0L),
       |  (a, x) -> named_struct(
       |    'prev', x,
       |    'run',  if(x = a.prev, a.run + 1L, 1L),
       |    'best', greatest(a.best, if(x = a.prev, a.run + 1L, 1L))),
       |  a -> a.best)""".stripMargin)

  /** t10 quality-filter rules (the Gopher/C4-style gate battery): each
    * document passes or fails four deterministic rules — word count,
    * mean token length band, stopword presence, and top-token dominance
    * (keyword-stuffing guard) — and the output is the per-(lang, source)
    * pass ledger a pipeline owner reads before choosing filter settings.
    *
    * Where t2 *scores* documents, t10 *decides*: binary rules with
    * integer-exact thresholds (see above — ratios are re-expressed as
    * cross-multiplied integer comparisons, so no float ever decides a
    * row's fate and the oracle can never disagree on a boundary doc).
    *
    * Scale shape: every rule — including the max-repeated-token run,
    * computed by a fold over the *sorted* token array — is a codegen'd
    * narrow map per document; the only exchange is the final tiny
    * (lang × source)-keyed aggregation. At 100 TB this is one scan. */
  /** Per-document gopher-rule evaluation (tokenized docs only, wc > 0):
    * the narrow-map core of [[t10GopherRules]], exposed so the composed
    * pipeline ledger (p1) can reuse the IDENTICAL per-doc verdicts its
    * quality stage claims. */
  private[graft] def gopherPerDoc(docs: DataFrame): DataFrame = docs
    .withColumn("ts", tokens(col("text")))
    .withColumn("wc", size(col("ts")).cast("long"))
    .filter(col("wc") > 0)
    .withColumn("sum_len",
      aggregate(transform(col("ts"), t => length(t).cast("long")), lit(0L), (a, x) => a + x))
    .withColumn("n_stop",
      size(filter(col("ts"), t => t.isin(StopList: _*))).cast("long"))
    .withColumn("max_run", maxTokenRun("ts"))
    .withColumn("r_wc", col("wc") >= MinWords)
    .withColumn("r_mean",
      col("sum_len") * 10 >= col("wc") * 42 && col("sum_len") * 10 <= col("wc") * 52)
    .withColumn("r_stop", col("n_stop") >= MinStops)
    .withColumn("r_top", col("max_run") * 8 <= col("wc"))

  def t10GopherRules(spark: SparkSession, dir: String): DataFrame = {
    val pass = (c: Column) => sum(when(c, 1L).otherwise(0L))
    gopherPerDoc(Sources.table(spark, dir, "documents"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        pass(col("r_wc")).as("p_wc"),
        pass(col("r_mean")).as("p_mean"),
        pass(col("r_stop")).as("p_stop"),
        pass(col("r_top")).as("p_top"),
        pass(col("r_wc") && col("r_mean") && col("r_stop") && col("r_top")).as("p_all"))
      .orderBy("lang", "source")
  }

  /** t11's span geometry and output size. */
  val SpanWords = 8
  val TopSpans = 50

  /** t11 duplicated-span mining — the cross-document twin of t8's
    * intra-document repetition: word-[[SpanWords]]-gram spans that occur
    * in ≥ 2 distinct documents, top-[[TopSpans]] by spread. This is the
    * discovery pass behind span-level dedup (C4 removes repeated
    * three-sentence spans; boilerplate headers/footers/licenses all
    * surface here first).
    *
    * Scale shape: spans are built array-side (one `transform`, no
    * self-join), then explode → groupBy(doc_id, span) → groupBy(span).
    * The first aggregation collapses within-doc repeats map-side (a
    * doc's spans never cross partitions before it), so the second sees
    * one row per (doc, span): `count(1)` IS n_docs — no count-distinct
    * Expand — and n_occ is the pre-summed per-doc count. The ≥ 2-docs
    * filter prunes the (overwhelmingly unique) span tail and the top-k
    * plans as a distributed TakeOrderedAndProject. Unique span text
    * makes the order total. */
  def t11DupSpans(spark: SparkSession, dir: String): DataFrame = {
    val spanList = transform(
      sequence(lit(0), size(col("ts")) - SpanWords),
      i => concat_ws(" ", (0 until SpanWords).map(k => col("ts")(i + k)): _*))
    Sources.table(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= SpanWords)
      .select(col("doc_id"), explode(spanList).as("span"))
      .groupBy("doc_id", "span").agg(count(lit(1)).as("occ"))
      .groupBy("span")
      .agg(count(lit(1)).as("n_docs"), sum("occ").as("n_occ"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("span"))
      .limit(TopSpans)
  }

  /** t12's chunk geometry: fixed [[ChunkTokens]]-token windows starting
    * every [[ChunkStride]] tokens (25% overlap) — the context-window
    * preparation step (RAG chunking / pretraining packing). */
  val ChunkTokens = 32
  val ChunkStride = 24

  /** t12 document chunking: split each document into overlapping
    * fixed-token windows and emit per chunk its position, length and
    * content digest — the tokenize-and-pack pass that turns a cleaned
    * corpus into model-ready sequences. Emitted as digests (not chunk
    * text) so the gate output stays narrow; a training writer would
    * project the slice itself through the identical plan.
    *
    * Scale shape: chunk starts, slices and digests are all built
    * array-side from one tokens array (`sequence` + `transform`), then
    * ONE explode streams chunk rows straight to the sink — no shuffle
    * before the output sort, linear in corpus size, and a doc's chunks
    * never leave its partition. */
  def t12Chunking(spark: SparkSession, dir: String): DataFrame = {
    val chunks = transform(
      sequence(lit(0), size(col("ts")) - 1, lit(ChunkStride)),
      (s, i) => struct(
        i.cast("long").as("chunk_no"),
        s.cast("long").as("start_tok"),
        least(size(col("ts")) - s, lit(ChunkTokens)).cast("long").as("n_tok"),
        md5(concat_ws(" ", slice(col("ts"), s + 1, lit(ChunkTokens)))).as("chunk_md5")))
    Sources.table(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"), explode(chunks).as("c"))
      .select(col("doc_id"), col("c.chunk_no"), col("c.start_tok"),
        col("c.n_tok"), col("c.chunk_md5"))
      .orderBy("doc_id", "chunk_no")
  }

  /** t13's packing geometry: the training context-window budget and the
    * per-shard document span. Packing (concatenate the token stream,
    * split every [[SeqTokens]]) is sequential BY NATURE within a
    * stream, so the scalable form packs independent shards: docs are
    * assigned to shards by doc_id range, and each (source, shard)
    * stream packs on its own. [[ShardDocs]] bounds the per-partition
    * sort — at 100 TB the same two constants give millions of bounded
    * shards instead of one unsortable global stream. */
  val SeqTokens = 128L
  val ShardDocs = 100L

  /** t13 sequence packing ledger: the concat-and-split step that turns a
    * cleaned corpus into fixed-length training sequences (each shard's
    * token streams are laid end-to-end and cut every [[SeqTokens]]
    * tokens). Per document: its shard, token count, offset in the
    * shard's packed stream, and the first/last sequence ids it lands in
    * — n_seqs > 1 marks documents split across a context boundary,
    * exactly what a packing QA pass audits before training.
    *
    * Scale shape: one narrow tokenize map, then a running sum windowed
    * over (source, shard) ordered by doc_id — one hash exchange on the
    * shard key plus an in-partition sort of ≤ [[ShardDocs]] docs.
    * Nothing global: a shard's ledger never sees another shard's rows,
    * so the plan is embarrassingly parallel in the shard count (the
    * output orderBy is gate canonicalization only). */
  def t13SeqPacking(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Sources.table(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        floor(col("doc_id") / lit(ShardDocs)).as("shard"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("start_tok", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("first_seq", floor(col("start_tok") / lit(SeqTokens)))
      .withColumn("last_seq",
        floor((col("start_tok") + col("n_tok") - 1) / lit(SeqTokens)))
      .select(col("source"), col("shard"), col("doc_id"), col("n_tok"),
        col("start_tok"), col("first_seq"), col("last_seq"),
        (col("last_seq") - col("first_seq") + 1).as("n_seqs"))
      .orderBy("doc_id")
  }

  /** t14's sampling hash modulus and multiplier (Knuth's multiplicative
    * constant). The keep/drop decision is pure 64-bit integer
    * arithmetic — `(doc_id mod 2³¹) · 2654435761 mod 2³¹` — so ANY
    * engine replays the exact same sample: no RNG state, no seed
    * plumbing, resumable mid-corpus. (The doc_id is folded mod 2³¹
    * first so the product stays inside a signed 64-bit long.) */
  val MixHashMod = 2147483648L
  val MixHashMul = 2654435761L

  /** The mix hash as one shared expression — single-sourced so the
    * gates that replay it (t14's sampling, p5's training-order shuffle,
    * p8's budget sampling) and their SQL oracles can never drift: an
    * edit here is an edit to every preference order at once. */
  def mixHash(c: Column): Column = c % MixHashMod * MixHashMul % MixHashMod

  /** The declared per-source weight table, w = (srcN mod 4) + 1 — the
    * ONE weight config in the repo, read by t14's doc-count blend and
    * p9's token-budget blend (the same mixture at two granularities);
    * a single source so an edit here changes BOTH gates together,
    * never one. Suffix semantics are the oracle's substr(source, 4):
    * unbounded length, so Scala and DuckDB cannot diverge on source
    * names with long numeric suffixes. */
  def sourceWeight(source: Column): Column =
    source.substr(lit(4), length(source)).cast("long") % 4 + 1

  /** t14 mixture sampling: the data-mixing step of a training pipeline —
    * downsample each source so the blended corpus approaches target
    * mixture weights, keeping as much data as possible without
    * upsampling. Weights derive from the source name ((srcN mod 4) + 1,
    * so they generalize across scale factors); the binding constraint
    * C = min(n_s / w_s) sets the largest feasible blend, and
    * rate_s = min(1, w_s · C / n_s) keeps the binding source whole.
    * Per-doc keep/drop is the deterministic integer hash above, so the
    * reported n_kept is EXACT and replayable, not an expectation.
    *
    * Scale shape: one tiny per-source count aggregation (|sources|
    * rows, broadcast back by AQE), one narrow hash-filter map over the
    * corpus, one ledger aggregation. The corpus is read once and never
    * shuffled on a wide key. */
  def t14MixSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
      .select(col("source"), col("doc_id"), sourceWeight(col("source")).as("w"))
    val counts = docs.groupBy("source").agg(
      first(col("w")).as("w"), count(lit(1)).as("n_docs"))
    // the binding constraint is a global min over the |sources|-row count
    // table — a single-partition window over 20 rows, NOT a cross join
    // (which would plan a nested-loop node and trip the blowup detector)
    val all = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val rates = counts
      .withColumn("c", min(col("n_docs") / col("w")).over(all))
      .select(col("source"), col("w"), col("n_docs"),
        least(lit(1.0), col("w") * col("c") / col("n_docs")).as("rate"))
    docs.join(rates.select("source", "rate"), "source")
      .withColumn("u", mixHash(col("doc_id")))
      .withColumn("kept", col("u").cast("double") < col("rate") * MixHashMod)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        round(first(col("rate")), 6).as("rate"))
      .orderBy("source")
  }

  /** t7 bigram top-k: the n-gram frequency view a corpus-analysis
    * pipeline runs next to q21's unigram counts. Bigrams are built
    * array-side (one `transform` over token indices — no self-join, no
    * second explode), then explode→partial-count→final-count with the
    * limit planned as a distributed TakeOrderedAndProject. Tie-break on
    * the gram text makes top-20 deterministic. */
  def t7Bigrams(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "documents")
      .select(tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("ts")) - 2),
        i => concat_ws(" ", col("ts")(i), col("ts")(i + 1)))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(20)

  /** t15 source-overlap matrix: for every source pair, the distinct
    * word-5-gram sets' intersection size and Jaccard — the
    * mixture-design QA pass that tells you whether two "different"
    * sources are actually the same crawl (d8 answers train-vs-eval;
    * this answers source-vs-source before t14 assigns mixture weights).
    *
    * Scale shape: one (source, gram) shuffle builds the distinct sets;
    * the intersection is a gram-keyed equi-join whose per-key fan-out is
    * bounded by the SOURCE COUNT (a gram in k sources yields C(k,2) ≤
    * C(n_sources,2) pair rows — corpus size never enters the bound);
    * the final matrix is n_sources² rows, driver-trivial. The pair
    * frame (per-source set sizes) is rows-per-source tiny, so its
    * inequality self-join is a constant-size nested loop, not a
    * corpus-shape blowup. */
  def t15SourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
    val sg = gram5(docs, col("source")).distinct()
    val sz = sg.groupBy("source").agg(count(lit(1)).as("n"))
    val shared = sg.as("a")
      .join(sg.as("b"), col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    sz.as("x").join(sz.as("y"), col("x.source") < col("y.source"))
      .select(col("x.source").as("source_a"), col("y.source").as("source_b"),
        col("x.n").as("n_grams_a"), col("y.n").as("n_grams_b"))
      .join(shared, Seq("source_a", "source_b"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("jaccard", round(
        col("n_shared").cast("double") /
          (col("n_grams_a") + col("n_grams_b") - col("n_shared")), 6))
      .orderBy("source_a", "source_b")
  }

  /** lgConfigK for x14's per-source HLL sketches (≈1.6% relative
    * standard error at 2¹² registers; matches x8's stream lgK so the
    * engine ships ONE sketch precision). */
  val OverlapLgK = 12

  /** x14 sketch source-overlap: t15's overlap matrix re-expressed as
    * HLL inclusion–exclusion — the form that survives 100 TB. t15 is
    * exact but shuffles every distinct (source, gram) row to build the
    * sets and joins the gram table against itself; x14 builds ONE
    * ~1.5 KB HLL sketch per source (map-side partial sketches merge
    * register-wise, so the exchange is sketches × partitions, never
    * gram-volume) and answers every pairwise question from the sketch
    * table alone: est_union = estimate(union(a, b)), est_shared =
    * est_a + est_b − est_union (clamped at 0 — inclusion–exclusion can
    * go fractionally negative on disjoint sets), est_jaccard =
    * shared/union. The corpus is READ ONCE for all n² pair answers —
    * with t15 every new source re-joins the full gram table.
    *
    * Rows-only by x8's declared precedent (DataSketches HLL internals
    * are engine-specific, so no DuckDB oracle) — ApproxSpec pins the
    * estimates against t15's exact matrix: set and union estimates
    * within 5% relative, and est_shared within the honest
    * inclusion–exclusion bound 0.05·(n_a + n_b) absolute (differencing
    * amplifies relative error when the overlap is small; the bound
    * states that truthfully instead of hiding it). Determinism-tested:
    * HLL register state is a pure function of the input multiset. */
  def x14SketchOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
    // no (source, gram) DISTINCT shuffle: HLL counts distinct natively,
    // so duplicate grams across docs ride the map-side partial sketch
    val sk = gram5(docs, col("source"))
      .groupBy("source")
      .agg(hll_sketch_agg(col("g"), lit(OverlapLgK)).as("sk"))
      .withColumn("est_n", hll_sketch_estimate(col("sk")))  // BIGINT estimate
    sk.as("x").join(sk.as("y"), col("x.source") < col("y.source"))
      .select(col("x.source").as("source_a"), col("y.source").as("source_b"),
        col("x.est_n").as("est_a"), col("y.est_n").as("est_b"),
        hll_sketch_estimate(hll_union(col("x.sk"), col("y.sk"))).as("est_union"))
      .withColumn("est_shared",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
      .withColumn("est_jaccard", round(
        col("est_shared").cast("double") / col("est_union").cast("double"), 6))
      .orderBy("source_a", "source_b")
  }

  /** t16 char-bigram familiarity: the corpus-trained statistical quality
    * filter (the CCNet "LM perplexity" stage reshaped for exactness) —
    * where t2/t10 apply STATIC heuristics, t16 trains its model FROM the
    * corpus: bigram counts over normalized text ([a-z ] after lowering)
    * become the model, and each document scores the sum of its own
    * bigrams' corpus counts. Gibberish and wrong-alphabet text land far
    * below the corpus-typical mean; integer counts keep the score exact
    * (no float log whose libm could differ from DuckDB's), with one
    * final division for the per-bigram mean. Docs whose normalized form
    * has < 2 chars carry no bigram and are excluded (oracle-identical,
    * the t2 zero-token precedent).
    *
    * Scale path: the model is an at-most-729-key aggregation (27² over
    * [a-z ]) — partial map-side combine makes the explode's shuffle
    * bytes model-sized, not corpus-sized; scoring attaches the model as
    * ONE broadcast row holding a DENSE 729-slot count array and folds
    * each doc's integer-coded bigram array expression-side with O(1)
    * positional lookups — no per-row join, no corpus exchange by doc_id
    * (plan-locked). The alphabet bijection (27·idx(c₁) + idx(c₂)) keys
    * the same counts the string bigrams would, so results are unchanged
    * and the oracle stays string-keyed. Both naive formulations were
    * measured and rejected at sf0.1: a map-typed model probed per
    * bigram (element_at on a map is a ~729-comparison linear scan) plus
    * index-addressed substr bigrams ran 18.6 s; the dense array alone
    * still 40 s (two O(position) substr calls per index dominate); the
    * one-pass char split + linear zip runs 2.0 s and scales 1.06× on
    * 10× data (SURVEY §4.2b). */
  def t16CharLmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.table(spark, dir, "documents")
    // [a-z ] → 0..26: the alphabet index of a single-char column
    def cIdx(c: Column): Column =
      when(c === " ", lit(26)).otherwise(ascii(c) - 97)
    val base = docs
      .select(col("doc_id"),
        regexp_replace(lower(col("text")), "[^a-z ]", "").as("norm"))
      .filter(length(col("norm")) >= 2)
      // one O(n) char split + a linear zip of adjacent indices — an
      // index-addressed substr() here is O(position) on UTF8 strings,
      // turning bigram extraction O(n²) per doc (measured 2×+ the whole
      // operator cost at sf0.1)
      .withColumn("ci", transform(split(col("norm"), ""), c => cIdx(c)))
      .withColumn("bg", zip_with(
        slice(col("ci"), lit(1), size(col("ci")) - 1),
        slice(col("ci"), lit(2), size(col("ci")) - 1),
        (a, b) => a * 27 + b))
      .select(col("doc_id"), col("bg"))
    val modelArr = base.select(explode(col("bg")).as("gi"))
      .groupBy("gi").agg(count(lit(1)).as("cnt"))
      .agg(map_from_entries(collect_list(struct(col("gi"), col("cnt")))).as("m"))
      .select(transform(sequence(lit(0), lit(27 * 27 - 1)),
        i => coalesce(element_at(col("m"), i), lit(0L))).as("arr"))
    base.crossJoin(broadcast(modelArr))
      .select(col("doc_id"),
        size(col("bg")).cast("long").as("n_bigrams"),
        aggregate(col("bg"), lit(0L),
          (acc, gi) => acc + element_at(col("arr"), gi + 1)).as("familiarity"))
      .withColumn("mean_fam",
        r4(col("familiarity").cast("double") / col("n_bigrams").cast("double")))
      .orderBy("doc_id")
  }

  /** t17 span-scrub: the APPLY step behind t11's duplicated-span mining —
    * exact-substring deduplication (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", the ExactSubstr pass):
    * every occurrence of a duplicated [[SpanWords]]-token span EXCEPT the
    * corpus-first one (lexicographic min (doc_id, start)) is cut from its
    * document, and each document re-emits its scrub ledger — token count,
    * duplicated-occurrence count, tokens removed, and the digest of the
    * surviving token stream (the cleaned text a training writer would
    * project through the identical plan; digests keep the gate output
    * narrow, t12's move). A token position is removed iff ANY non-first
    * duplicate occurrence covers it, so a kept-first occurrence can still
    * lose tokens to an overlapping duplicate of a different span — the
    * stated (and oracle-replayed) rule.
    *
    * Scale shape: spans are built array-side from one tokens array (t11's
    * transform — no self-join), and every shuffle is keyed on a 32-char
    * span digest, never text: one explode → groupBy(span) keeps only
    * (n_occ, first) per span — map-side combinable — and the join back to
    * occurrences builds from the DUPLICATED-span subset only (the
    * overwhelmingly unique tail never joins). Removed positions return to
    * array domain per doc (collect_list bounded by the doc's duplicate
    * density), and the scrub itself is linear array arithmetic — coverage
    * ranges flatten to a distinct position set, `array_except` cuts it
    * from the position index, no per-token × per-range scan. The doc-id
    * shuffle of the range list is the only other exchange; document text
    * rides narrow the whole way.
    * Reference lineage: the reference dedups nothing (BASELINE.md); this
    * extends its per-tweet cleaning pattern (ProducerFinal.scala:63-66)
    * to the corpus-scrub suite t11 opened. */
  def t17SpanScrub(spark: SparkSession, dir: String): DataFrame = {
    val W = SpanWords
    val toks = Sources.table(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("ts"))
    val occ = toks.filter(size(col("ts")) >= W)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("ts")) - W),
        i => md5(concat_ws(" ", (0 until W).map(k => col("ts")(i + k)): _*)))))
      .toDF("doc_id", "start", "span")
    val spanStats = occ.groupBy("span").agg(
      count(lit(1)).as("n_occ"),
      min(struct(col("doc_id"), col("start"))).as("first"))
    val dupOcc = occ.join(spanStats.filter(col("n_occ") >= 2), Seq("span"))
      .filter(!(col("doc_id") === col("first.doc_id") &&
        col("start") === col("first.start")))
      .select(col("doc_id"), col("start"))
    val ranges = dupOcc.groupBy("doc_id")
      .agg(collect_list("start").as("starts"), count(lit(1)).as("n_dup_occ"))
    toks.join(ranges, Seq("doc_id"), "left")
      .withColumn("removed", array_distinct(flatten(transform(
        coalesce(col("starts"), array().cast("array<int>")),
        s => sequence(s, s + W - 1)))))
      .withColumn("keptPos", array_except(
        transform(col("ts"), (_, i) => i), col("removed")))
      .select(col("doc_id"),
        size(col("ts")).cast("long").as("n_tok"),
        coalesce(col("n_dup_occ"), lit(0L)).as("n_dup_occ"),
        (size(col("ts")) - size(col("keptPos"))).cast("long").as("n_removed"),
        md5(concat_ws(" ", transform(col("keptPos"), p => col("ts")(p))))
          .as("clean_md5"))
      .orderBy("doc_id")
  }
}
