package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Streaming replay of a fixture table (deterministic: file source). */
  def stream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(path(dir, name)).schema
    normalizeTs(spark.readStream.schema(raw).parquet(path(dir, name)))
  }

  /** `events.ts` arrives as INT64 nanos (TIMESTAMP(NANOS) parquet has no
    * Spark type; `spark.sql.legacy.parquet.nanosAsLong=true`). Convert to
    * a micro-precision timestamp with integer division — nanos ≈ 1.7e18
    * exceeds double's 53-bit mantissa, so a floating-point detour would
    * corrupt the low digits. DuckDB truncates ns→µs the same way. */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case None => df
    }
}
