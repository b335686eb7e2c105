package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Windowed
import graft.streaming.{Replay, StreamPipeline}

/** Batch≡stream equivalence (SURVEY.md §5.2#3): the identical transform
  * object runs as a batch DataFrame and as a Structured Streaming replay
  * (file source, AvailableNow, memory sink); results must agree. */
class StreamEquivSpec extends AnyFunSuite {
  import TestSpark._

  test("q07 tumbling window: batch ≡ stream (complete mode)") {
    val batch = rows(Windowed.q07Tumbling(spark, sf))
    val stream = rows(
      Replay.complete(spark, sf, "events")(Windowed.tumbling).orderBy("w_start"))
    assert(stream == batch)
  }

  test("q08 sliding window: batch ≡ stream (complete mode)") {
    val batch = rows(Windowed.q08Sliding(spark, sf))
    val stream = rows(
      Replay.complete(spark, sf, "events")(Windowed.sliding)
        .orderBy("w_start", "event_type"))
    assert(stream == batch)
  }

  test("q09 session windows: batch ≡ stream") {
    val batch = rows(Windowed.q09Sessions(spark, sf))
    val stream = rows(
      Replay.complete(spark, sf, "events")(Windowed.sessions)
        .orderBy("user_id", "s_start"))
    assert(stream == batch)
  }

  test("q10 dedup: streaming first-arrival keeps exactly the batch key set") {
    val batchKeys = Windowed.q10Dedup(spark, sf)
      .select("user_id", "event_type").collect().map(_.toSeq).toSet
    val stream = Replay.append(spark, sf, "events")(Windowed.dedupExactStream)
    val streamKeys = stream.select("user_id", "event_type")
      .collect().map(_.toSeq).toSet
    assert(streamKeys == batchKeys)
    assert(stream.count() == batchKeys.size.toLong, "a key was emitted twice")
  }

  test("q10 dedup within watermark: bounded state emits a superset of batch keys") {
    val batchKeys = Windowed.q10Dedup(spark, sf)
      .select("user_id", "event_type").collect().map(_.toSeq).toSet
    val stream = Replay.append(spark, sf, "events")(Windowed.dedupWithinWatermark)
    val streamKeys = stream.select("user_id", "event_type")
      .collect().map(_.toSeq).toSet
    assert(batchKeys.subsetOf(streamKeys))
    assert(stream.count() >= batchKeys.size.toLong)
  }

  test("q24 score pipeline: gate (streaming) ≡ batch twin") {
    val batch = rows(StreamPipeline.q24Batch(spark, sf))
    val stream = rows(StreamPipeline.q24StreamScore(spark, sf))
    assert(stream == batch)
  }

  test("stream-static enrichment join ≡ batch join") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val customer = graft.io.Sources.table(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    def enrich(events: DataFrame): DataFrame =
      events.join(customer, events("user_id") === customer("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(count(lit(1)).as("cnt"))
    val batch = rows(
      enrich(graft.io.Sources.table(spark, sf, "events"))
        .orderBy("c_mktsegment", "event_type"))
    val stream = rows(
      Replay.complete(spark, sf, "events")(enrich)
        .orderBy("c_mktsegment", "event_type"))
    assert(stream == batch)
  }
}
