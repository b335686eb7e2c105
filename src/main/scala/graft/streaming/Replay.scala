package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.io.{Sinks, Sources}

/** Deterministic streaming replay harness: run any batch-compatible
  * `DataFrame => DataFrame` transform as a Structured Streaming query over
  * a fixture table, drain it with AvailableNow, and hand back the result
  * as a batch DataFrame.
  *
  * This is the engine's batch≡stream equivalence tool (SURVEY.md §5.2#3):
  * the same transform object runs in both modes, so streaming semantics
  * are tested, not trusted. Replaces the reference's DStream wiring
  * (ConsumerESFinal.scala:36-47) with Structured Streaming + checkpoint.
  *
  * Every replay runs in its own child session (`spark.newSession()`:
  * shared SparkContext + cache, isolated SQL conf), so a per-query
  * state-partition override never touches the caller's conf and replays
  * can run concurrently — no global lock.
  *
  * Scale modes: [[complete]] re-emits the whole aggregate each trigger
  * (fine for small finite aggregates, wrong for unbounded streams);
  * [[appendFlushed]] is the production shape for windowed aggregations —
  * watermarked append into a parquet sink, state evicted as the
  * watermark passes; [[updateMaterialized]] is the production shape for
  * non-windowed aggregations — per-batch upserts materialized to a keyed
  * store (the ES-index pattern), last write per key wins.
  */
object Replay {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run `transform` over a streaming read of `table`, complete-mode.
    * `statePartitions` caps the stateful shuffle width for the query:
    * a streaming aggregation's state-store count is fixed at the first
    * checkpoint, and a handful of result groups doesn't need (or want)
    * one state store per core — each partition pays file-backed state
    * I/O per micro-batch. Size it to key cardinality, not core count. */
  def complete(spark: SparkSession, dir: String, table: String,
               statePartitions: Option[Int] = None)
              (transform: DataFrame => DataFrame): DataFrame =
    run(spark, dir, table, "complete", statePartitions)(transform)

  /** Run `transform` over a streaming read of `table`, append-mode
    * (requires a watermark upstream for stateful ops). */
  def append(spark: SparkSession, dir: String, table: String,
             statePartitions: Option[Int] = None)
            (transform: DataFrame => DataFrame): DataFrame =
    run(spark, dir, table, "append", statePartitions)(transform)

  /** Update-mode replay (mapGroupsWithState and friends). */
  def update(spark: SparkSession, dir: String, table: String,
             statePartitions: Option[Int] = None)
            (transform: DataFrame => DataFrame): DataFrame =
    run(spark, dir, table, "update", statePartitions)(transform)

  /** Event time of the flush sentinel (see [[appendFlushed]]): far past
    * any fixture timestamp, deliberately off any window-size boundary so
    * the sentinel's own windows always end after the final watermark and
    * are withheld from the output. */
  val FlushInstant: java.time.Instant = java.time.Instant.parse("2100-01-01T00:00:07Z")

  /** Watermarked append-mode replay of a *windowed* aggregation into a
    * parquet sink — the shape that survives an unbounded stream: state is
    * evicted as the watermark passes, each window is emitted exactly once
    * when finalized, and the sink is distributed (no driver-side memory
    * table).
    *
    * A finite replay needs one extra move: append mode only emits windows
    * the watermark has passed, so the trailing windows of a drained
    * fixture would be withheld forever. The harness unions a single
    * *flush sentinel* row (event time [[FlushInstant]], written at replay
    * time so the file source orders it after the fixture files) that
    * drives the final watermark past every real window; the sentinel's
    * own window ends after the watermark and is never emitted, so the
    * output equals the batch result with no filtering.
    *
    * `transform` must install the watermark itself (it owns the event-
    * time column), e.g. `df => agg(df.withWatermark("ts", "10 minutes"))`.
    */
  def appendFlushed(spark: SparkSession, dir: String, table: String,
                    statePartitions: Option[Int] = None,
                    tsCol: String = "ts")
                   (transform: DataFrame => DataFrame): DataFrame = {
    val session = isolated(spark, statePartitions)
    val src = Sources.stream(session, dir, table)
    val sentinelDir = Files.createTempDirectory("graft_flush_").toString + "/flush"
    writeSentinel(session, src.schema, tsCol, sentinelDir)
    val sentinel = session.readStream.schema(src.schema).parquet(sentinelDir)
    val outDir = Files.createTempDirectory("graft_replay_out_").toString
    val checkpoint = Files.createTempDirectory("graft_ckpt_")
    try {
      val q = transform(src.unionByName(sentinel))
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpoint.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally deleteRecursively(checkpoint.toFile)
    spark.read.parquet(outDir)
  }

  /** Update-mode replay of a *non-windowed* aggregation materialized
    * through the idempotent per-batch sink ([[Sinks.partitionedBatchWrite]]):
    * each micro-batch's updated rows land in their own `batch_id`
    * directory, and the read-back keeps the latest write per key — the
    * upsert-into-an-index pattern (reference ConsumerESFinal.scala:93)
    * without a driver-side memory table or complete-mode re-emission.
    * The result is the final value per key regardless of how the replay
    * was sliced into batches. */
  def updateMaterialized(spark: SparkSession, dir: String, table: String,
                         keyCols: Seq[String],
                         statePartitions: Option[Int] = None)
                        (transform: DataFrame => DataFrame): DataFrame = {
    val session = isolated(spark, statePartitions)
    val outDir = Files.createTempDirectory("graft_upsert_out_").toString
    val checkpoint = Files.createTempDirectory("graft_ckpt_")
    try {
      val q = transform(Sources.stream(session, dir, table))
        .writeStream
        .foreachBatch(Sinks.partitionedBatchWrite(outDir, Seq.empty) _)
        .outputMode("update")
        .option("checkpointLocation", checkpoint.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally deleteRecursively(checkpoint.toFile)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("batch_id").desc)
    spark.read.parquet(outDir)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "batch_id")
  }

  /** Child session with an isolated SQL conf: state-partition overrides
    * are per-replay, never global, so replays run concurrently. The child
    * inherits the builder-time options (extensions, state store provider,
    * timezone) and shares the SparkContext. */
  private def isolated(spark: SparkSession, statePartitions: Option[Int]): SparkSession = {
    val session = spark.newSession()
    statePartitions.foreach(n =>
      session.conf.set("spark.sql.shuffle.partitions", n.toString))
    session
  }

  /** One row at [[FlushInstant]] with type-default values elsewhere,
    * written as parquet *after* the fixture files exist so the file
    * source (oldest-modification-first) never processes it before them —
    * a sentinel in an earlier batch would make all real data late. */
  private def writeSentinel(session: SparkSession, schema: StructType,
                            tsCol: String, dirPath: String): Unit = {
    val row = Row.fromSeq(schema.fields.map { f =>
      if (f.name == tsCol) java.sql.Timestamp.from(FlushInstant)
      else defaultFor(f.dataType)
    }.toSeq)
    session.createDataFrame(java.util.Arrays.asList(row), schema)
      .coalesce(1).write.parquet(dirPath)
  }

  private def defaultFor(dt: DataType): Any = dt match {
    case LongType => 0L
    case IntegerType => 0
    case DoubleType => 0.0
    case FloatType => 0.0f
    case StringType => ""
    case BooleanType => false
    case BinaryType => Array.emptyByteArray
    case TimestampType => java.sql.Timestamp.from(java.time.Instant.EPOCH)
    case _: DecimalType => java.math.BigDecimal.ZERO
    case ArrayType(_, _) => Seq.empty
    case _ => null
  }

  private def run(spark: SparkSession, dir: String, table: String, mode: String,
                  statePartitions: Option[Int])
                 (transform: DataFrame => DataFrame): DataFrame = {
    val session = isolated(spark, statePartitions)
    val name = s"graft_replay_${counter.incrementAndGet()}"
    val checkpoint = Files.createTempDirectory("graft_ckpt_")
    try {
      val q = transform(Sources.stream(session, dir, table))
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      // the memory sink holds the result; the drained checkpoint is scratch
      deleteRecursively(checkpoint.toFile)
    }
    session.table(name)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
