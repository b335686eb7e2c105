package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.io.Sources
import graft.out.Canonical._

/** Time-window operators (SURVEY.md §2.4 Q7–Q10).
  *
  * Each is written as a pure `DataFrame => DataFrame` transform so the
  * identical code runs in batch mode (the correctness gate) and as a
  * Structured Streaming replay (`graft.streaming.Replay`); batch≡stream
  * equivalence is asserted in tests.
  *
  * Window starts are emitted as epoch-second BIGINTs: timestamps don't
  * survive engine boundaries (timezone/precision), epochs do.
  */
object Windowed {

  private def wStart(c: String = "window"): org.apache.spark.sql.Column =
    col(c).getField("start").cast("long")

  /** Q7: 5-minute tumbling window — count + exact sum. */
  def tumbling(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .select(wStart().as("w_start"), col("cnt"), col("sum_value"))

  /** Gate entry runs through Structured Streaming in the shape that
    * survives an unbounded stream: watermarked append mode into a
    * distributed parquet sink — window state is evicted as the watermark
    * passes and each window is emitted exactly once, instead of
    * complete-mode's re-emission of the whole (time-growing) aggregate
    * to a driver-side table every trigger. The batch twin below feeds
    * the equivalence test. Window-count state is modest (one row per
    * 5-min window), so 8 state partitions. */
  def q07Tumbling(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Replay.appendFlushed(spark, dir, "events", Some(8))(df =>
      tumbling(df.withWatermark("ts", "10 minutes")))
      .orderBy("w_start")

  def q07TumblingBatch(spark: SparkSession, dir: String): DataFrame =
    tumbling(Sources.table(spark, dir, "events")).orderBy("w_start")

  /** Q8: 10-minute window sliding every 5 minutes, per event_type. */
  def sliding(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(wStart().as("w_start"), col("event_type"), col("cnt"))

  /** Streaming gate entry — watermarked append like q07. */
  def q08Sliding(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Replay.appendFlushed(spark, dir, "events", Some(8))(df =>
      sliding(df.withWatermark("ts", "10 minutes")))
      .orderBy("w_start", "event_type")

  def q08SlidingBatch(spark: SparkSession, dir: String): DataFrame =
    sliding(Sources.table(spark, dir, "events")).orderBy("w_start", "event_type")

  /** Q9: per-user session windows with a 10-minute gap.
    * Session end follows Spark semantics: last event + gap. */
  def sessions(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("user_id"),
        col("session_window").getField("start").cast("long").as("s_start"),
        col("session_window").getField("end").cast("long").as("s_end"),
        col("cnt"))

  /** Gate entry runs the watermarked streaming session path, matching
    * q07/q08: session state is merged incrementally and evicted once the
    * watermark passes the session's close, each finalized session emitted
    * exactly once into a distributed sink — the only session shape whose
    * state stays bounded on an unbounded stream. Batch twin below feeds
    * the equivalence test. */
  def q09Sessions(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Replay.appendFlushed(spark, dir, "events", Some(8))(df =>
      sessions(df.withWatermark("ts", "10 minutes")))
      .orderBy("user_id", "s_start")

  def q09SessionsBatch(spark: SparkSession, dir: String): DataFrame =
    sessions(Sources.table(spark, dir, "events")).orderBy("user_id", "s_start")

  /** Q10: dedup on (user_id, event_type), keeping the earliest event.
    * Batch form uses row_number for a *deterministic* survivor — the
    * streaming form (`dropDuplicates` on the key) keeps first-arrival,
    * which equals earliest-ts because the replay source is time-ordered. */
  def q10Dedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Sources.table(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id")
      .orderBy("user_id", "event_type")
  }

  /** Streaming dedup with *bounded* state: duplicates arriving within the
    * watermark horizon are dropped, state older than the watermark is
    * evicted (`dropDuplicatesWithinWatermark`). At 100 TB/day this is the
    * only dedup that survives — unbounded `dropDuplicates` state grows
    * with key cardinality forever. Semantics: a key re-appearing after
    * the horizon is re-emitted, so the output is a superset of the batch
    * distinct (asserted in tests). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type", "event_id")

  /** Streaming first-arrival dedup (unbounded state; exact). */
  def dedupExactStream(events: DataFrame): DataFrame =
    events
      .dropDuplicates("user_id", "event_type")
      .select("user_id", "event_type", "event_id")
}
