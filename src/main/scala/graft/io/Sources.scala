package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Batch + streaming readers over the fixture layout: one parquet file
  * (or directory) per table under an SF dir (`TESTDATA.md`).
  *
  * Parquet is self-describing, so batch reads take the footer schema
  * (no inference run, no schema drift possible); the streaming reader
  * re-uses the batch schema because `readStream` requires one up front.
  *
  * At cluster scale the same entry points work unchanged: a directory of
  * many parquet parts splits into `maxPartitionBytes`-sized input slices,
  * and filter/projection pushdown happens at this scan.
  */
object Sources {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(path(dir, name)))

  /** Streaming replay of a fixture table (deterministic: file source).
    * The streaming file source requires a directory-like path: for a
    * non-glob path FileStreamSource force-overrides `basePath` to the
    * path itself, which fails for a single file. Wrapping the file name
    * in `{...}` makes it a (single-alternative) glob, so the explicit
    * `basePath` = SF dir survives and the one-file fixture replays. */
  def stream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(path(dir, name)).schema
    normalizeTs(
      spark.readStream.schema(raw)
        .option("basePath", dir)
        .parquet(s"$dir/{$name.parquet}"))
  }

  /** Kafka consumer options (reference ConsumerESFinal.scala:40-45:
    * subscribe-by-topic, earliest offsets; deserialization is the
    * `cast("string")` in [[kafkaStream]] — the connector hands bytes). */
  def kafkaSourceOptions(bootstrapServers: String, topic: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> "earliest")

  /** Streaming Kafka source (O7 parity) producing the same (key, value)
    * string shape the file-replay path feeds downstream — so every
    * transform runs unchanged against Kafka or replay. Requires the
    * spark-sql-kafka connector jar (absent in this zero-egress image;
    * the file source is the test default). */
  def kafkaStream(spark: SparkSession, bootstrapServers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .options(kafkaSourceOptions(bootstrapServers, topic))
      .load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")

  /** `events.ts` arrives as INT64 nanos (TIMESTAMP(NANOS) parquet has no
    * Spark type; `spark.sql.legacy.parquet.nanosAsLong=true`). Convert to
    * a micro-precision timestamp with integer division — nanos ≈ 1.7e18
    * exceeds double's 53-bit mantissa, so a floating-point detour would
    * corrupt the low digits. DuckDB truncates ns→µs the same way.
    * TIMESTAMP_NTZ inputs (written by engines that drop the tz flag) are
    * re-tagged as instants — the session is pinned to UTC, so the wall
    * clock IS the instant and downstream epoch casts stay valid. */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case Some(TimestampNTZType) => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
}
