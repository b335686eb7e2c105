package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Sinks, Sources}
import graft.streaming.StreamPipeline

/** Sinks + Kafka wiring (O5/O6/O7/O19/O21 analogs). The Kafka connector
  * jar is absent in this zero-egress image, so Kafka coverage is the
  * config contract + wire-format round-trip; file sinks run for real. */
class SinkSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("parquetAppend is exactly-once across replays with the same checkpoint") {
    val out = tmp("graft_sink_out_"); val ckpt = tmp("graft_sink_ckpt_")
    val expected = Sources.table(spark, sf, "events").count()
    def runOnce(): Unit = {
      val q = Sinks.parquetAppend(
        Sources.stream(spark, sf, "events").select("event_id", "user_id", "event_type"),
        out, ckpt)
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == expected)
    runOnce() // same checkpoint: nothing new to commit
    assert(spark.read.parquet(out).count() == expected, "replay duplicated rows")
  }

  test("a partials pipeline killed mid-batch resumes from its checkpoint exactly-once") {
    // The crash shape every foreachBatch store pipeline (d12, s11–s16,
    // s20, p2/p3/p6, x8–x17) must survive: the job dies DURING a batch — possibly
    // after a torn partial write — and the restarted job must (a) not
    // reprocess committed batches, (b) redo the failed batch from the
    // checkpoint, overwriting any torn output, and (c) end with the
    // store bit-identical to an uninterrupted run.
    import org.apache.spark.sql.streaming.Trigger
    val work = tmp("graft_crash_")
    val splitDir = s"$work/in"; val store = s"$work/st"; val ckpt = s"$work/ckpt"
    val events = Sources.table(spark, sf, "events").select("event_id", "event_type")
    var seen = Set.empty[String]
    (0 until 4).foreach { b =>
      events.filter(pmod(col("event_id"), lit(4)) === b)
        .coalesce(1).write.mode("append").parquet(splitDir)
      val wave = new java.io.File(splitDir).listFiles()
        .filter(f => f.getName.startsWith("part-") && !seen(f.getName))
      wave.foreach(f => assert(f.setLastModified(1000000000000L + b * 60000L)))
      seen ++= wave.map(_.getName)
    }
    def run(crashAt: Option[Long]): Unit = {
      val session = spark.newSession()
      val q = session.readStream
        .schema(session.read.parquet(splitDir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(splitDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          if (crashAt.contains(batchId)) sys.error(s"injected crash in batch $batchId")
          batch.groupBy("event_type").agg(count(lit(1)).as("cnt"))
            .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(crashAt = Some(2L))
    }
    val committed = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    assert(committed == Set("batch_id=0", "batch_id=1"),
      s"crash at batch 2 should leave exactly batches 0-1 committed, got $committed")
    // tag the committed dirs: a resume that reprocesses them would
    // overwrite the dir and lose the sentinel
    committed.foreach { d =>
      new java.io.File(s"$store/$d/_SENTINEL").createNewFile(): Unit
    }
    // torn write: the dying batch got PART of its output down before the
    // crash — poison rows the redo must overwrite, not merge with
    spark.range(1).select(lit("poison").as("event_type"), lit(999999L).as("cnt"))
      .write.mode("overwrite").parquet(s"$store/batch_id=2")
    run(crashAt = None)
    val dirs = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    assert(dirs == (0 to 3).map(b => s"batch_id=$b").toSet,
      s"resume did not complete the remaining batches: $dirs")
    assert(new java.io.File(s"$store/batch_id=0/_SENTINEL").exists() &&
      new java.io.File(s"$store/batch_id=1/_SENTINEL").exists(),
      "resume reprocessed an already-committed batch")
    val merged = spark.read.parquet(s"$store/batch_id=*")
      .groupBy("event_type").agg(sum("cnt").as("cnt"))
    assert(merged.filter(col("event_type") === "poison").count() == 0,
      "torn partial output survived the redo — overwrite is not redo-safe")
    val expected = events.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"resumed store diverged from the uninterrupted aggregate: $got vs $expected")
  }

  test("partitionedAppend writes the ES-analog partitioned layout, replay-safe") {
    val out = tmp("graft_part_out_"); val ckpt = tmp("graft_part_ckpt_")
    val expected = Sources.table(spark, sf, "events").count()
    def runOnce(): Unit = {
      val q = Sinks.partitionedAppend(
        Sources.stream(spark, sf, "events").select("event_id", "user_id", "event_type"),
        out, ckpt, Seq("event_type"))
      q.awaitTermination()
    }
    runOnce()
    val batchDirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("batch_id="))
    assert(batchDirs.nonEmpty, "no batch directories written")
    val dirs = batchDirs.head.listFiles().map(_.getName).filter(_.startsWith("event_type="))
    assert(dirs.nonEmpty, "no partition directories written")
    assert(spark.read.parquet(out).count() == expected)
    runOnce()
    assert(spark.read.parquet(out).count() == expected, "replay duplicated rows")
  }

  test("partitionedBatchWrite re-run with the same batchId is idempotent (failure replay)") {
    val out = tmp("graft_part_idem_")
    val batch = Sources.table(spark, sf, "events")
      .select("event_id", "user_id", "event_type").limit(100)
    val write = Sinks.partitionedBatchWrite(out, Seq("event_type")) _
    write(batch, 7L)
    val once = spark.read.parquet(out).count()
    // a foreachBatch retry after partial failure re-runs the SAME batchId:
    // the overwrite must replace, not double, the batch's rows
    write(batch, 7L)
    assert(spark.read.parquet(out).count() == once, "same-batch replay duplicated rows")
    // a different batchId is a different batch and must append
    write(batch, 8L)
    assert(spark.read.parquet(out).count() == 2 * once)
  }

  test("indexSink seam drives two different store impls through one pipeline") {
    val src = Sources.stream(spark, sf, "events")
      .select("event_id", "user_id", "event_type")
    val expected = Sources.table(spark, sf, "events").count()

    // impl 1: the built-in parquet index, resolved config-style
    val out = tmp("graft_idx_parquet_")
    Sinks.indexSink(src,
      format = "parquet-index",
      options = Map("path" -> out, "partitionCols" -> "event_type"),
      checkpoint = tmp("graft_idx_ck1_")).awaitTermination()
    assert(spark.read.parquet(out).count() == expected)

    // impl 2: a custom store behind the same seam — what an ES/JDBC
    // writer would be; counts rows per batch into a shared sink
    Sinks.indexSink(src, SinkSpec.recordingWriter, tmp("graft_idx_ck2_"))
      .awaitTermination()
    assert(SinkSpec.recorded.values.sum == expected,
      s"custom writer saw ${SinkSpec.recorded} (want total $expected)")
    assert(SinkSpec.recorded.keySet.forall(_ >= 0L), "batch ids not delivered")
  }

  test("unknown index format fails loudly at the seam, not mid-stream") {
    val e = intercept[IllegalArgumentException] {
      Sinks.indexWriterFor("elasticsearch", Map.empty)
    }
    assert(e.getMessage.contains("unknown index format"))
  }

  test("media table matches the declared multimodal schema") {
    import graft.ops.MultimodalOps
    val media = MultimodalOps.asMedia(Sources.table(spark, sf, "documents"))
    // literal-derived columns are non-nullable; compare structure, not nullability
    assert(media.schema.catalogString == MultimodalOps.mediaSchema.catalogString)
  }

  test("console and kafka writers configure without starting") {
    val wire = StreamPipeline.toWire(Sources.stream(spark, sf, "events"))
      .withColumnRenamed("line", "value")
    Sinks.console(wire) // configuration only; no broker/terminal needed
    Sinks.kafka(wire, "broker:9092", "t", "/tmp/ck")
    succeed
  }

  test("kafka source wiring reaches provider lookup (jar absent in this image)") {
    val e = intercept[Exception] {
      Sources.kafkaStream(spark, "broker:9092", "events_in")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected missing-provider error naming kafka, got: ${e.getMessage.take(120)}")
  }

  test("kafka sink/source option contracts carry the reference's semantics") {
    val sink = Sinks.kafkaSinkOptions("broker:9092", "events_out")
    assert(sink("kafka.bootstrap.servers") == "broker:9092")
    assert(sink("topic") == "events_out")
    assert(sink("kafka.acks") == "all") // reference ProducerFinal.scala:55
    val src = Sources.kafkaSourceOptions("broker:9092", "events_in")
    assert(src("subscribe") == "events_in")
    assert(src("startingOffsets") == "earliest")
  }

  test("CSV wire format round-trips through parse (no malformed drops on clean data)") {
    val events = Sources.table(spark, sf, "events")
    val parsed = StreamPipeline.scoreTransform(StreamPipeline.toWire(events))
    assert(parsed.count() == events.count())
    val back = parsed.select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
    val orig = events.select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
    assert(rows(back) == rows(orig))
  }

  test("malformed wire records are guarded out, not corrupted (unlike the reference)") {
    import spark.implicits._
    val wire = Seq("1,7,click,12.5", "garbage-line", "2,9,view,NaNope").toDF("line")
    val parsed = StreamPipeline.scoreTransform(wire)
    assert(parsed.count() == 1)
    assert(rows(parsed.select("event_id")).head.head == 1L)
  }
}

/** Companion state for the custom-writer seam test: foreachBatch closures
  * serialize, so the recording sink lives in a static (per-JVM) field the
  * local-mode executors and the assertion both see. */
object SinkSpec {
  import java.util.concurrent.ConcurrentHashMap
  import scala.jdk.CollectionConverters._

  private val batchRows = new ConcurrentHashMap[Long, Long]()

  def recorded: Map[Long, Long] = batchRows.asScala.toMap

  val recordingWriter: Sinks.IndexBatchWriter = new Sinks.IndexBatchWriter {
    def write(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
      // idempotent on batchId by construction: a retry overwrites its slot
      batchRows.put(batchId, batch.count()): Unit
  }
}
