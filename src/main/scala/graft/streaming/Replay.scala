package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.io.Sources

/** Deterministic streaming replay harness: run any batch-compatible
  * `DataFrame => DataFrame` transform as a Structured Streaming query over
  * a fixture table, drain it with AvailableNow, and hand back the result
  * as a batch DataFrame (memory sink).
  *
  * This is the engine's batch≡stream equivalence tool (SURVEY.md §5.2#3):
  * the same transform object runs in both modes, so streaming semantics
  * are tested, not trusted. Replaces the reference's DStream wiring
  * (ConsumerESFinal.scala:36-47) with Structured Streaming + checkpoint.
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

  /** Serializes replays: the statePartitions override mutates the shared
    * session conf for the duration of the drain, so concurrent replays
    * (or a future parallel test runner) must not interleave with it. */
  private val replayLock = new Object

  private def run(spark: SparkSession, dir: String, table: String, mode: String,
                  statePartitions: Option[Int])
                 (transform: DataFrame => DataFrame): DataFrame = replayLock.synchronized {
    val name = s"graft_replay_${counter.incrementAndGet()}"
    val checkpoint = Files.createTempDirectory("graft_ckpt_")
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    try {
      val q = transform(Sources.stream(spark, dir, table))
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      statePartitions.foreach(_ => spark.conf.set("spark.sql.shuffle.partitions", orig))
      // the memory sink holds the result; the drained checkpoint is scratch
      deleteRecursively(checkpoint.toFile)
    }
    spark.table(name)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
