package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sources

/** Source/sink format coverage beyond the fixture parquet: ORC, CSV and
  * JSON round-trips (the formats a 100 TB lake actually mixes), schema
  * evolution across parquet writes, and AQE's runtime skew-join split.
  *
  * The reference's only wire format is CSV-in-Kafka-strings
  * (ConsumerESFinal.scala:49-55), covered by the q24 pipeline's
  * from_csv/to_csv; this spec covers the at-rest formats.
  */
class FormatSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  /** events, minus the free-text props column (CSV/JSON round-trip of
    * embedded JSON quoting is a serialization detail, not format
    * coverage) with ts as epoch micros for exact text-format fidelity. */
  private lazy val flat: DataFrame =
    Sources.table(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("ts_us"))

  private def sortedRows(df: DataFrame): Vector[Vector[Any]] =
    rows(df.orderBy("event_id"))

  test("ORC round-trips exactly and pushes filters to the ORC scan") {
    val dir = tmp("graft_orc_")
    flat.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(sortedRows(back) == sortedRows(flat))
    val q = back.filter(col("event_type") === "click" && col("value") > 10)
    q.collect()
    val plan = q.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PushedFilters") && plan.contains("event_type"),
      "ORC scan does not carry pushed filters")
  }

  test("CSV round-trips exactly with an explicit schema") {
    val dir = tmp("graft_csv_")
    flat.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(flat.schema).csv(dir)
    assert(sortedRows(back) == sortedRows(flat))
  }

  test("JSON round-trips exactly with an explicit schema") {
    val dir = tmp("graft_json_")
    flat.write.json(dir)
    val back = spark.read.schema(flat.schema).json(dir)
    assert(sortedRows(back) == sortedRows(flat))
  }

  test("parquet schema evolution: old files surface new columns as null") {
    // the 100 TB reality: a pipeline adds a column and the lake holds
    // both generations side by side. mergeSchema must read them as one
    // table with nulls for the missing column, not fail or drop data.
    val dir = Files.createTempDirectory("graft_evo_").toString
    val v1 = flat.select("event_id", "event_type")
    val v2 = flat.select(col("event_id"), col("event_type"), col("value"))
      .withColumn("event_id", col("event_id") + 1000000L)
    v1.write.parquet(s"$dir/gen=1")
    v2.write.parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet ==
      Set("event_id", "event_type", "value", "gen"))
    assert(merged.count() == v1.count() + v2.count())
    assert(merged.filter(col("gen") === 1 && col("value").isNotNull).count() == 0)
    assert(merged.filter(col("gen") === 2 && col("value").isNull).count() == 0)
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // 90% of rows land on one join key; with broadcast disabled and the
    // skew thresholds scaled to fixture bytes, AQE must re-plan the sort
    // merge join with a split skewed partition — the runtime half of the
    // q35 salting story (salting for known-hot keys, AQE for discovered
    // ones).
    val child = spark.newSession()
    child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    child.conf.set("spark.sql.shuffle.partitions", "8")
    child.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    child.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    child.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
    child.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
    // Two subtleties this test documents (found the hard way):
    //  - a skewed reducer partition is split at MAPPER boundaries, so a
    //    single-file scan (one map task) is unsplittable — repartition
    //    first so the shuffle has multiple mappers;
    //  - column pruning shrinks a key-only shuffle below any realistic
    //    threshold, so the payload column must survive the join for the
    //    hot partition to have weight.
    val ev = Sources.table(child, "/root/testdata/sf0.01", "events").repartition(8)
    val skewed = ev.withColumn("k",
      when(pmod(col("event_id"), lit(100)) === 0, col("event_id")).otherwise(0L))
    val dim = ev.select((col("event_id") % 2000000L).as("k2"), col("value").as("w"))
    val j = skewed.join(dim, col("k") === col("k2"))
      .agg(count(lit(1)).as("cnt"), max(length(col("props"))).as("w"))
    j.collect()
    val plan = j.queryExecution.explainString(FormattedMode)
    assert(plan.contains("skew=true"),
      s"AQE did not split the skewed partition; plan:\n${plan.take(4000)}")
  }
}
