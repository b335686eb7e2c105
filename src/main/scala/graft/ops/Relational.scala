package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.io.Sources
import graft.out.Canonical._

/** Batch relational operators (SURVEY.md §2.4 Q1–Q6, Q11–Q19, Q23).
  *
  * Every query is a pure declarative DataFrame plan — filters and
  * projections reach the parquet scan, aggregates get map-side partials,
  * and small dimension tables broadcast — so each plan is the one we'd
  * want on a 1000-executor cluster, not just on local[32].
  */
object Relational {

  /** Q1 typed-scan-filter: predicate + projection pushed to the scan. */
  def q01ScanFilter(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "events")
      .filter(col("event_type") === "click" && col("value") > 10)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy("event_id")

  /** Q2 cast-projection. FLOOR before the long cast: Spark truncates
    * double→long while DuckDB rounds, so the floor keeps both aligned. */
  def q02CastProjection(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "events")
      .select(
        col("event_id"),
        floor(col("value")).cast("long").as("v"),
        upper(col("event_type")).as("t"))
      .orderBy("event_id")

  /** Q3 class-share (dashboard pie shape): counts + ratio-of-total. */
  def q03ClassShare(spark: SparkSession, dir: String): DataFrame = {
    val counts = Sources.table(spark, dir, "events")
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
    // The empty-frame window runs over the 5-row aggregate, not the fact
    // table — a single-partition exchange of a handful of rows is fine at
    // any scale.
    val w = Window.partitionBy()
    counts
      .withColumn("share", r4(col("cnt").cast("double") / sum("cnt").over(w).cast("double")))
      .orderBy("event_type")
  }

  /** Q4 weighted-share (dashboard "sized by" shape). */
  def q04WeightedShare(spark: SparkSession, dir: String): DataFrame = {
    val sums = Sources.table(spark, dir, "events")
      .groupBy("event_type").agg(dsum(col("value")).as("total_value"))
    val w = Window.partitionBy()
    sums
      .withColumn("share", r4(col("total_value") / sum("total_value").over(w)))
      .orderBy("event_type")
  }

  /** Q5 topk-other: top-3 groups by count, remainder bucketed 'Other'. */
  def q05TopkOther(spark: SparkSession, dir: String): DataFrame = {
    val counts = Sources.table(spark, dir, "events")
      .groupBy("event_type").agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("c").desc, col("event_type"))
    counts
      .withColumn("rn", row_number().over(w))
      .withColumn("bucket", when(col("rn") <= 3, col("event_type")).otherwise("Other"))
      .groupBy("bucket").agg(sum("c").as("cnt"))
      .orderBy(col("cnt").desc, col("bucket"))
  }

  /** Q6 two-dim-pct: counts + percentage within the first dimension. */
  def q06TwoDimPct(spark: SparkSession, dir: String): DataFrame = {
    val classed = Sources.table(spark, dir, "events")
      .withColumn("vclass", when(col("value") >= 100, "high").otherwise("low"))
      .groupBy("event_type", "vclass").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type")
    classed
      .withColumn("pct", r4(col("cnt").cast("double") * 100.0 / sum("cnt").over(w).cast("double")))
      .orderBy("event_type", "vclass")
  }

  /** Q11 join-3way: fact ⋈ dim ⋈ dim, revenue per nation.
    * `nation` is broadcast (25 rows at every SF); the orders⋈customer
    * join shuffles both sides on the join key — at 100 TB that is the
    * correct plan (AQE handles skew), and the aggregate is partial+final. */
  def q11Join3Way(spark: SparkSession, dir: String): DataFrame = {
    val orders = Sources.table(spark, dir, "orders")
    val customer = Sources.table(spark, dir, "customer")
    val nation = Sources.table(spark, dir, "nation")
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("n_name")
  }

  /** Q12 pricing-summary (TPC-H Q1 shape). Flagship aggregate. */
  def q12PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-01-01 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q13 semi/anti joins: customers with / without orders, counted. */
  def q13SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val customer = Sources.table(spark, dir, "customer")
    val orders = Sources.table(spark, dir, "orders").select("o_custkey")
    val withO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("cnt")).withColumn("k", lit("with_orders"))
    val without = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("cnt")).withColumn("k", lit("without_orders"))
    withO.unionByName(without).select("k", "cnt").orderBy("k")
  }

  /** Q14 rank-in-group: top-2 orders by price per customer. */
  def q14RankInGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Sources.table(spark, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Q15 running-agg: per-customer running sum of order totals by date.
    * Decimal addends make the prefix sums order-exact (Canonical.dsum). */
  def q15RunningAgg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Sources.table(spark, dir, "orders")
      .withColumn("run_sum", sum(col("o_totalprice").cast(Money)).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "run_sum")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q16 rollup over region→nation with grouping() decoded to 'ALL'
    * (avoids NULL-ordering divergence between engines). */
  def q16Rollup(spark: SparkSession, dir: String): DataFrame = {
    val customer = Sources.table(spark, dir, "customer")
    val nation = Sources.table(spark, dir, "nation")
    val region = Sources.table(spark, dir, "region")
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup("r_name", "n_name")
      .agg(count(lit(1)).as("cnt"), dsum(col("c_acctbal")).as("sum_bal"),
        grouping(col("r_name")).as("gr"), grouping(col("n_name")).as("gn"))
      .select(
        when(col("gr") === 1, "ALL").otherwise(col("r_name")).as("region_name"),
        when(col("gn") === 1, "ALL").otherwise(col("n_name")).as("nation_name"),
        col("cnt"), col("sum_bal"))
      .orderBy("region_name", "nation_name")
  }

  /** Q17 exact distinct count per group. */
  def q17DistinctExact(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("dusers"))
      .orderBy("event_type")

  /** Q18 set ops over per-type user sets. */
  def q18SetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Sources.table(spark, dir, "events")
    def users(t: String) = ev.filter(col("event_type") === t)
      .select("user_id").distinct()
    val click = users("click"); val purchase = users("purchase")
    def counted(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("cnt")).withColumn("op", lit(name))
    counted("except", click.except(purchase))
      .unionByName(counted("intersect", click.intersect(purchase)))
      .unionByName(counted("union", click.union(purchase).distinct()))
      .select("op", "cnt")
      .orderBy("op")
  }

  /** Q19 scalar-function battery over orders. */
  def q19ScalarSuite(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        substring(col("o_orderpriority"), 1, 3).as("pri3"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        length(col("o_orderstatus")).cast("long").as("status_len"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_pri"),
        coalesce(col("o_orderstatus"), lit("?")).as("status_nn"))
      .orderBy("o_orderkey")

  /** Q23 JSON property extraction + group-by. */
  def q23JsonProps(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy("k")
}
