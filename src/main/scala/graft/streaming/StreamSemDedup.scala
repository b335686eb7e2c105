package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.SimilarityOps
import graft.out.Canonical._

/** d20: streaming SEMANTIC dedup — the incremental form of d18's
  * hierarchical SemDeDup, completing the streaming column of the dedup
  * matrix: d12 streams the TEXT near-dup family (MinHash bands), d20
  * streams the EMBEDDING family (two-level quantizer cells). This is
  * the continuously-fed-corpus form of the SemDeDup pipeline: vectors
  * arrive in crawl batches, each batch is assigned against the OFFLINE
  * two-level codebook (s23's quantizer-artifact motion — G + sub ≈ 2√k
  * dots per vector, never the flat N·k sweep), and new duplicate pairs
  * are exactly the within-cell pairs with exact cosine ≥
  * [[SimilarityOps.SemThreshold]] that have at least one side in the
  * batch — so the candidate join is batch × store, never store × store.
  *
  * Each emitted pair carries d15/d18's pairwise VICTIM (the member
  * closer to its centroid — the paper's keep-the-cluster-edge rule).
  * The victim rule reads only the two sides' stored centroid cosines,
  * so it is ARRIVAL-ORDER-FREE: the stream's pair union is exactly the
  * batch gate's pair set, whichever order the corpus arrives in — the
  * correctness claim is stream ≡ batch d18 at pair granularity, checked
  * against the hier chain's closed-form oracle (shared CTE prefix with
  * s22/d18) and re-proven under REVERSED arrival by StreamEquivSpec.
  * A pair is emitted exactly once — in the micro-batch of its LATER
  * arrival (cell assignments are static per vector, so two already-
  * stored vectors can never become a new candidate).
  *
  * Scale design: per-batch cost is batch-size × 2√k assignment dots +
  * one cell equi-join of the batch against the assigned store + exact
  * verification on within-cell candidates only — the paper's Σ cell²
  * bound, paid incrementally. The store is the assigned-vector index a
  * production deployment already keeps (s11/s23's layout: partitioned
  * by arrival batch, cell a stored column), reads are pruned to
  * `batch_id < current` so a retried batch neither re-emits nor meets
  * its own partial write, and the k ∝ corpus deployment rule (measured
  * in ScaleCheck's scaled-k entries for the batch twins) applies
  * unchanged because the quantizer is a pluggable offline artifact. */
object StreamSemDedup {

  def d20StreamSemDedup(spark: SparkSession, dir: String): DataFrame =
    d20WithBatchCount(spark, dir)._1

  /** Test seam: result + replayed micro-batch count, with the arrival
    * order pluggable (StreamEquivSpec replays REVERSED arrival to the
    * same pair set — the order-free claim, proven not asserted). */
  private[graft] def d20WithBatchCount(spark: SparkSession, dir: String,
      orderExpr: org.apache.spark.sql.Column = col("vec_id")): (DataFrame, Int) = {
    val work = Files.createTempDirectory("graft_semstream_").toString
    val splitDir = s"$work/in"
    val all = SimilarityOps.normed(spark, dir)
    all.select("vec_id", "v", "nrm", "label")
      .repartitionByRange(StreamAnnIngest.SplitFiles, orderExpr)
      .write.parquet(splitDir)
    // the offline artifact: the TWO-LEVEL codebook (one nested row),
    // written before the stream starts — s23's quantizer-file motion
    val cbPath = s"$work/codebook"
    val seeds = all.filter(col("vec_id") < SimilarityOps.IvfCells)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    SimilarityOps.hierCentArr(seeds, SimilarityOps.HierSub)
      .coalesce(1).write.parquet(cbPath)
    val store = s"$work/assigned"
    val pairStore = s"$work/pairs"
    val session = spark.newSession()
    val q = session.readStream
      .schema(session.read.parquet(splitDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(splitDir)
      .writeStream
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, cbPath, store, pairStore))
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val nBatches = Option(new java.io.File(pairStore).listFiles())
      .map(_.count(_.getName.startsWith("batch_id="))).getOrElse(0)
    val result = spark.read.parquet(pairStore)
      .select(col("a_id"), col("b_id"), col("cos_sim"), col("victim"))
      .orderBy("a_id", "b_id")
    (result, nBatches)
  }

  private def processBatch(batch: DataFrame, batchId: Long,
                           cbPath: String, store: String,
                           pairStore: String): Unit = {
    val spark = batch.sparkSession
    // batch-size × 2√k assignment against the static codebook; ccos
    // (the centroid cosine) rides along — it IS the victim signal
    val asn = SimilarityOps
      .hierAssignWithCodebook(batch, spark.read.parquet(cbPath))
      .select("vec_id", "v", "nrm", "cell", "ccos")
      .persist()
    try {
      val prior = IncrementalDedup.readStore(spark, store, batchId, asn.schema)
      val seen = prior.unionByName(asn)
      // new candidates = within-cell id pairs with >= 1 batch-side
      // member; least/greatest normalizes, distinct collapses the
      // both-in-batch double hit
      val cand = asn.as("x").join(seen.as("y"),
          col("x.cell") === col("y.cell") && col("x.vec_id") =!= col("y.vec_id"))
        .select(least(col("x.vec_id"), col("y.vec_id")).as("a_id"),
          greatest(col("x.vec_id"), col("y.vec_id")).as("b_id"))
        .distinct()
      // exact verify + the pairwise victim rule (d15/d18's): vector
      // payloads are fetched by id from the seen set, so the pair rows
      // that shuffle carry ids — never two vectors per candidate twice
      val a = seen.select(col("vec_id").as("a_id"), col("v").as("av"),
        col("nrm").as("an"), col("ccos").as("acc"))
      val b = seen.select(col("vec_id").as("b_id"), col("v").as("bv"),
        col("nrm").as("bn"), col("ccos").as("bcc"))
      cand.join(a, "a_id").join(b, "b_id")
        .withColumn("cs", SimilarityOps.dot(col("av"), col("bv")) / (col("an") * col("bn")))
        .filter(col("cs") >= SimilarityOps.SemThreshold)
        .withColumn("victim",
          when(col("acc") > col("bcc"), col("a_id"))
            .when(col("acc") < col("bcc"), col("b_id"))
            .otherwise(greatest(col("a_id"), col("b_id"))))
        .select(col("a_id"), col("b_id"), r4(col("cs")).as("cos_sim"), col("victim"))
        .write.mode("overwrite").parquet(s"$pairStore/batch_id=$batchId")
      asn.write.mode("overwrite").parquet(s"$store/batch_id=$batchId")
    } finally { asn.unpersist(); () }
  }
}
