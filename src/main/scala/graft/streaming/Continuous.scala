package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuously-triggered pipeline (O1/O23 parity): the reference runs an
  * unbounded push receiver on a 5-second batch interval
  * (ProducerFinal.scala:41-43, Seconds(5)); everywhere else graft drains
  * finite replays with AvailableNow. This is the long-running shape — a
  * `rate` source standing in for the live feed (zero-egress image: no
  * Twitter/Kafka endpoint), a real `Trigger.ProcessingTime` interval, and
  * micro-batches committing until the query is stopped.
  *
  * The transform is the flagship score pipeline's wire-format path
  * (StreamPipeline.scoreTransform), so the demo proves the production
  * transform — not a toy projection — runs under a continuous trigger. */
object Continuous {

  /** The reference's micro-batch interval. */
  val ReferenceInterval = "5 seconds"

  /** Synthesize the CSV wire format from a `rate` source: event ids from
    * the rate sequence, the value decile driving the flagged/normal split
    * downstream. Shape-compatible with StreamPipeline.wireSchema. */
  def rateWire(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
      .select(concat_ws(",",
        col("value").as("event_id"),
        pmod(col("value"), lit(97)).as("user_id"),
        element_at(array(lit("click"), lit("view"), lit("purchase")),
          (pmod(col("value"), lit(3)) + 1).cast("int")),
        (pmod(col("value"), lit(10)) * lit(15.5)).cast("double")).as("line"))

  /** Start the continuously-triggered pipeline: rate wire → parse/guard/
    * score (the q24 transform) → append sink. Runs until `.stop()` —
    * callers own the lifecycle (the test drains a few intervals and
    * stops; production would run indefinitely). */
  def scorePipeline(spark: SparkSession, queryName: String,
                    rowsPerSecond: Int = 100,
                    interval: String = ReferenceInterval): StreamingQuery =
    StreamPipeline.scoreTransform(rateWire(spark, rowsPerSecond))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(interval))
      .start()
}
