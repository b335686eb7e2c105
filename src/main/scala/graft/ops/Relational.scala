package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.io.Sources
import graft.out.Canonical._

/** Batch relational operators (SURVEY.md §2.4 — the non-windowed,
  * non-streaming query entries: scans, aggregates, joins, set ops,
  * window functions, grouping sets, sampling, subqueries).
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
    * (avoids NULL-ordering divergence between engines).
    *
    * Expressed through the SQL surface: the Dataset API's `rollup` after a
    * multi-table join trips Spark 4.1's ambiguous-self-join detector (the
    * rollup Expand duplicates the grouping attributes) even when inputs
    * are aliased and pre-projected; `GROUP BY ROLLUP` in SQL resolves
    * cleanly and plans identically (Expand + partial/final hash agg,
    * dims broadcast). */
  def q16Rollup(spark: SparkSession, dir: String): DataFrame = {
    val id = java.util.UUID.randomUUID().toString.replace("-", "")
    val views = Seq("customer", "nation", "region").map { t =>
      val v = s"q16_${t}_$id"
      Sources.table(spark, dir, t).createOrReplaceTempView(v)
      v
    }
    try
      spark.sql(s"""
        SELECT /*+ BROADCAST(n), BROADCAST(r) */
          CASE WHEN grouping(r_name) = 1 THEN 'ALL' ELSE r_name END AS region_name,
          CASE WHEN grouping(n_name) = 1 THEN 'ALL' ELSE n_name END AS nation_name,
          count(*) AS cnt,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        FROM q16_customer_$id c
        JOIN q16_nation_$id n ON c_nationkey = n_nationkey
        JOIN q16_region_$id r ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY region_name, nation_name""")
    finally
      // the returned DataFrame holds the resolved plan; the views are
      // only needed during analysis — drop them so repeated invocations
      // don't leak catalog entries
      views.foreach(spark.catalog.dropTempView(_): Unit)
  }

  /** Q17 exact distinct count per group. */
  def q17DistinctExact(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("dusers"))
      .orderBy("event_type")

  /** Q18 set ops over per-type user sets, in ONE pass: a single
    * groupBy(user_id) computes per-user click/purchase flags, then a tiny
    * final aggregate derives except/intersect/union cardinalities. One
    * shuffle over events instead of six (the naive except/intersect/union
    * plan scans the fact table three times). */
  def q18SetOps(spark: SparkSession, dir: String): DataFrame = {
    val flags = Sources.table(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("user_id")
      .agg(
        max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("p"))
    flags.agg(
        sum(when(col("c") === 1 && col("p") === 0, 1L).otherwise(0L)).as("n_except"),
        sum(when(col("c") === 1 && col("p") === 1, 1L).otherwise(0L)).as("n_intersect"),
        sum(when(col("c") === 1 || col("p") === 1, 1L).otherwise(0L)).as("n_union"))
      .selectExpr(
        "stack(3, 'except', n_except, 'intersect', n_intersect, 'union', n_union) AS (op, cnt)")
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

  /** Q25 as-of join: each purchase matched to the user's most recent
    * click at-or-before it (classic attribution as-of).
    *
    * Spark has no native as-of join; the scalable formulation is the
    * union-tag window pattern: one shuffle on user_id, one ordered window
    * scan carrying the last click forward (`last(..., ignoreNulls)`), no
    * join at all. An equality join + filter formulation would need a
    * per-pair candidate explosion; this is O(n log n) per user partition
    * and exactly the plan you'd run at 100 TB. Clicks sort before
    * purchases at equal timestamps (tag 0 < 1), event_id breaks ties. */
  def q25AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Sources.table(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "click", 0).otherwise(1).as("tag"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("click_id",
        last(when(col("tag") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ts",
        last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        col("ts").cast("long").as("ts_p"),
        col("click_id"),
        col("click_ts").cast("long").as("ts_c"),
        (col("ts").cast("long") - col("click_ts").cast("long")).as("lag_sec"))
      .orderBy("purchase_id")
  }

  /** Q26 range-predicate join: lineitems shipped within 30 days of their
    * order's date, revenue per priority. Equi key (orderkey) carries the
    * join; the range predicate rides along as a post-join filter inside
    * the same SMJ — no nested-loop fallback. */
  def q26RangeJoin(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "lineitem")
      .join(Sources.table(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderpriority")

  /** Q27 cube over (event_type × value class): all four grouping
    * combinations with grouping() decoded to 'ALL'. Single-table cube
    * doesn't trip the self-join detector that forced Q16 onto the SQL
    * surface. */
  def q27Cube(spark: SparkSession, dir: String): DataFrame = {
    val g = Sources.table(spark, dir, "events")
      .withColumn("vclass", when(col("value") >= 100, "high").otherwise("low"))
      .cube("event_type", "vclass")
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
        grouping(col("event_type")).as("ge"), grouping(col("vclass")).as("gv"))
    g.select(
        when(g("ge") === 1, "ALL").otherwise(g("event_type")).as("etype"),
        when(g("gv") === 1, "ALL").otherwise(g("vclass")).as("vclass"),
        g("cnt"), g("sum_value"))
      .orderBy("etype", "vclass")
  }

  /** Q28 pivot: event counts per type pivoted by value class. The pivot
    * values are declared (not discovered), so the plan is a single
    * aggregation with conditional counters — no extra pass to collect
    * distinct pivot keys. */
  def q28Pivot(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "events")
      .withColumn("vclass", when(col("value") >= 100, "high").otherwise("low"))
      .groupBy("event_type")
      .pivot("vclass", Seq("high", "low"))
      .agg(count(lit(1)))
      .select(col("event_type"),
        coalesce(col("high"), lit(0L)).as("n_high"),
        coalesce(col("low"), lit(0L)).as("n_low"))
      .orderBy("event_type")

  /** Q29 distribution stats per event_type — stddev and value/hour
    * correlation derived from decimal-exact moments (n, Σx, Σx², Σxy)
    * instead of Spark's streaming-merge stddev/corr: moment sums in
    * DECIMAL are associative/commutative, so the derived statistics are
    * bit-stable at any parallelism AND replayable by the oracle; the
    * built-in Welford-merge aggregates are not (merge-order-dependent
    * floats). One pass, partial+final agg. */
  def q29MomentStats(spark: SparkSession, dir: String): DataFrame = {
    val Wide = org.apache.spark.sql.types.DecimalType(28, 8)
    def s(c: org.apache.spark.sql.Column) = sum(c.cast(Wide)).cast("double")
    Sources.table(spark, dir, "events")
      .withColumn("h", hour(col("ts")).cast("double"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        s(col("value")).as("sx"),
        s(col("value") * col("value")).as("sxx"),
        s(col("h")).as("sh"),
        s(col("h") * col("h")).as("shh"),
        s(col("value") * col("h")).as("sxh"))
      .select(col("event_type"), col("n"),
        // clamp sums-of-squares at 0: decimal rounding can push a
        // near-constant group's variance a hair negative, where Spark's
        // sqrt gives NaN but DuckDB's *errors* — and guard zero-variance
        // correlations to NULL (DuckDB x/0.0 is NULL, Spark is NaN/Inf)
        greatest(col("sxx") - col("sx") * col("sx") / col("n"), lit(0.0)).as("vx"),
        greatest(col("shh") - col("sh") * col("sh") / col("n"), lit(0.0)).as("vh"),
        (col("sxh") - col("sx") * col("sh") / col("n")).as("cov"))
      .select(
        col("event_type"), col("n"),
        // n=1 groups: sample stddev is 0/0 — Spark's sqrt gives NaN where
        // DuckDB yields NULL, so pin both engines to NULL explicitly
        when(col("n") === 1, lit(null).cast("double"))
          .otherwise(r4(sqrt(col("vx") / (col("n") - 1)))).as("value_stddev"),
        when(col("vx") === 0.0 || col("vh") === 0.0, lit(null))
          .otherwise(r4(col("cov") / (sqrt(col("vx")) * sqrt(col("vh")))))
          .as("value_hour_corr"))
      .orderBy("event_type")
  }

  /** Q30 collection aggregation: per user, the sorted distinct event
    * types as one string. collect_list order is partition-dependent, so
    * the array is sorted before serialization — the only deterministic
    * way to emit a collection. */
  def q30CollectTypes(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "events")
      // collect_set drops NULLs while DuckDB's list(DISTINCT) keeps them;
      // excluding null types up front makes both engines agree by construction
      .filter(col("event_type").isNotNull)
      .groupBy("user_id")
      .agg(concat_ws(",", array_sort(collect_set(col("event_type")))).as("types"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")

  /** Q31 lag/lead: per event, seconds since the user's previous event and
    * the type of their next one — one window shuffle on user_id. */
  def q31LagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Sources.table(spark, dir, "events")
      .select(
        col("event_id"), col("user_id"),
        (col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long")).as("gap_sec"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy("event_id")
  }

  /** Q23 JSON property extraction + group-by. */
  def q23JsonProps(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy("k")

  /** Q33 grouping sets — the general form rollup (q16) and cube (q27)
    * specialize: two marginal breakdowns plus the grand total in ONE
    * pass over the facts (Expand + partial/final agg), where separate
    * GROUP BYs would re-scan the table per breakdown. grouping() decodes
    * each set's inactive key to 'ALL', as in q16/q27. */
  def q33GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val g = Sources.table(spark, dir, "events")
      .withColumn("vclass", when(col("value") >= 100, "high").otherwise("low"))
      .groupingSets(
        Seq(Seq(col("event_type")), Seq(col("vclass")), Seq()),
        col("event_type"), col("vclass"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
        grouping(col("event_type")).as("ge"), grouping(col("vclass")).as("gv"))
    g.select(
        when(g("ge") === 1, "ALL").otherwise(g("event_type")).as("etype"),
        when(g("gv") === 1, "ALL").otherwise(g("vclass")).as("vclass"),
        g("cnt"), g("sum_value"))
      .orderBy("etype", "vclass")
  }

  /** Q34 rank-function family: percent_rank, cume_dist, ntile(4) per
    * event within its type, ordered by (value, event_id) — a unique
    * total order, so every rank value is deterministic (no tie
    * ambiguity) and replays exactly in the oracle. One window pass. */
  def q34RankFamily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Sources.table(spark, dir, "events")
      .select(
        col("event_id"), col("event_type"),
        r4(percent_rank().over(w)).as("prank"),
        r4(cume_dist().over(w)).as("cdist"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("event_id")
  }

  /** Q32 exact percentiles per event_type (p50/p90/p99 of value).
    * `percentile` is the EXACT interpolating aggregate (sort-based, same
    * `lo + (hi-lo)·frac` interpolation as the oracle's quantile_cont),
    * not the approximate sketch — determinism over speed at the gate.
    * Grouped exact percentiles shuffle each group's values once, same
    * cost class as any keyed sort; the approximate path
    * (percentile_approx, mergeable sketches, no per-group sort) is the
    * 100 TB swap-in when a bounded error is acceptable — identical plan
    * shape, so it's a one-function change. */
  def q32Percentiles(spark: SparkSession, dir: String): DataFrame = {
    val ps = percentile(col("value"), array(lit(0.5), lit(0.9), lit(0.99)))
    Sources.table(spark, dir, "events")
      .groupBy("event_type")
      .agg(ps.as("p"))
      .select(col("event_type"),
        r4(element_at(col("p"), 1)).as("p50"),
        r4(element_at(col("p"), 2)).as("p90"),
        r4(element_at(col("p"), 3)).as("p99"))
      .orderBy("event_type")
  }

  /** Salt fan-out for Q35: enough to split a hot key across a cluster's
    * reducers without inflating the replicated side meaningfully. */
  private val Salts = 16

  /** Q35 skew-salted join: every event joined to its type's mean value
    * (deviation from group mean). `event_type` has a handful of values,
    * so the naive shuffle join sends *all* rows for a hot type through
    * one reducer — at 100 TB that single task is the job. The salted
    * plan splits each hot key 16 ways: the fact side gets a
    * deterministic salt from `event_id`, the (small) aggregate side is
    * replicated across all 16 salts, and the join key becomes
    * (event_type, salt) — same rows out, 16× the reducers on the hot
    * key. `shuffle_hash` hint keeps the demo honest: at gate scale the
    * replicated side would auto-broadcast (which is the *right* plan
    * when the aggregate side is small — salting is for when it isn't). */
  def q35SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Sources.table(spark, dir, "events")
    val fact = events.withColumn("salt", pmod(hash(col("event_id")), lit(Salts)))
    val typeMeans = events
      .groupBy(col("event_type").as("m_type"))
      .agg(davg(col("value")).as("mean_value"))
      .withColumn("salt", explode(sequence(lit(0), lit(Salts - 1))))
    fact
      .join(typeMeans.hint("shuffle_hash"),
        fact("event_type") === typeMeans("m_type") &&
          fact("salt") === typeMeans("salt"))
      .select(
        col("event_id"), col("event_type"),
        r4(col("value") - col("mean_value")).as("dev"))
      .orderBy("event_id")
  }

  /** Q36 regional-revenue (TPC-H Q5 shape): the engine's deepest join —
    * six tables, one year, one region, local-supplier constraint
    * (customer and supplier in the same nation). The scale plan: region/
    * nation/supplier/customer broadcast (small dims), orders⋈lineitem is
    * the one real shuffle, the date filter on orders is pushed to its
    * scan before the join, and the final aggregate is 5 rows. */
  def q36RegionalRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = Sources.table(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Sources.table(spark, dir, "nation")
    val customer = Sources.table(spark, dir, "customer")
    val supplier = Sources.table(spark, dir, "supplier")
    val orders = Sources.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    val lineitem = Sources.table(spark, dir, "lineitem")
    orders
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Q39 higher-order-function battery over the embedding vectors:
    * `transform` / `filter` / `aggregate` / `zip_with` / `slice` /
    * `array_sort` / `reverse` — the lambda surface a feature-engineering
    * pipeline lives on. All of it runs inside whole-stage codegen as a
    * narrow map (no UDF, no shuffle); every float is cast to double
    * *before* arithmetic so the left-fold accumulation is bit-identical
    * to the oracle's list_* functions. */
  def q39HofBattery(spark: SparkSession, dir: String): DataFrame = {
    val dv = transform(col("embedding"), x => x.cast("double"))
    val sum64 = (acc: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) => acc + x
    Sources.table(spark, dir, "embeddings")
      .select(
        col("vec_id"),
        size(filter(col("embedding"), x => x > 0f)).cast("long").as("n_pos"),
        r4(aggregate(transform(dv, x => abs(x)), lit(0.0), sum64)).as("l1"),
        r4(aggregate(zip_with(dv, reverse(dv), (a, b) => a * b), lit(0.0), sum64)).as("revdot"),
        r4(aggregate(transform(slice(col("embedding"), 1, 8), x => x.cast("double")), lit(0.0), sum64)).as("head8_sum"),
        element_at(array_sort(col("embedding")), 32).cast("double").as("sorted32"))
      .orderBy("vec_id")
  }

  /** Q40 deterministic sample/split assignment — the reproducibility
    * primitive of a training-data pipeline: every row's split
    * (train/val/test, 70/20/10) and 20%-sample membership derive from
    * md5 of its key, so the assignment is stable across runs, engines,
    * partitionings and cluster sizes — unlike `rand()`/`randomSplit`,
    * which are seed + partitioning dependent (x3 shows the seeded
    * in-engine variant). Narrow map + one partial/final agg; the same
    * expressions tag 100 TB in place with no shuffle before the agg. */
  def q40SampleSplit(spark: SparkSession, dir: String): DataFrame = {
    def h(prefix: String): org.apache.spark.sql.Column =
      conv(substring(md5(concat(lit(prefix), col("event_id").cast("string"))), 1, 4), 16, 10)
        .cast("long")
    val bucket = h("") % 10
    val split = when(bucket <= 6, "train").when(bucket <= 8, "val").otherwise("test")
    val sampled = when(h("s|") % 5 === 0, 1L).otherwise(0L)
    Sources.table(spark, dir, "events")
      .withColumn("split", split)
      .withColumn("in_sample", sampled)
      .groupBy("event_type", "split")
      .agg(count(lit(1)).as("cnt"), sum(col("in_sample")).as("n_sampled"))
      .orderBy("event_type", "split")
  }

  /** Q41 multiset operators — the `All` forms q18's flag-aggregation
    * summary doesn't exercise as operators: `intersectAll` / `exceptAll`
    * keep duplicate multiplicity (min / subtract), `union` keeps
    * everything. Catalyst plans the All forms as a single aggregate over
    * per-side counts plus a generate — one shuffle each, no join — which
    * is exactly the multiset algebra you want at 100 TB (never a
    * row-by-row anti join). */
  def q41MultisetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Sources.table(spark, dir, "events")
    val a = ev.filter(col("event_type") === "click").select("user_id")
    val b = ev.filter(col("event_type") === "purchase").select("user_id")
    def summary(df: DataFrame, op: String): DataFrame =
      df.agg(count(lit(1)).as("cnt"), countDistinct(col("user_id")).as("n_users"))
        .select(lit(op).as("op"), col("cnt"), col("n_users"))
    summary(a.exceptAll(b), "except_all")
      .unionByName(summary(a.intersectAll(b), "intersect_all"))
      .unionByName(summary(a.union(b), "union_all"))
      .orderBy("op")
  }

  /** Q42 date/time battery over orders — the calendar-dimension surface
    * every reporting pipeline derives: ISO week truncation, quarter,
    * day-of-week (aligned to the oracle's 0-based convention by
    * construction), ISO week number, next-month boundary, and offset
    * into the month. Pure narrow map; formatted as strings at the edge
    * because dates don't survive engine boundaries, strings do. */
  def q42DateBattery(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd").as("week_start"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
        date_format(add_months(date_trunc("month", col("o_orderdate")), 1), "yyyy-MM-dd").as("next_month"),
        datediff(col("o_orderdate"), date_trunc("month", col("o_orderdate"))).cast("long").as("day_in_month"))
      .orderBy("o_orderkey")

  /** Q43 correlated scalar subquery (SQL surface): orders priced above
    * 2× their customer's mean order value. Catalyst decorrelates the
    * subquery into a per-customer aggregate joined back to orders — one
    * shuffle on o_custkey, no per-row re-execution (the thing a naive
    * subquery engine does n times). The mean uses the decimal-exact
    * formulation on both sides so the > comparison is boundary-safe. */
  def q43ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val id = java.util.UUID.randomUUID().toString.replace("-", "")
    val v = s"q43_orders_$id"
    Sources.table(spark, dir, "orders").createOrReplaceTempView(v)
    try
      spark.sql(s"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM $v o
        WHERE o_totalprice > 2 * (
          SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
          FROM $v o2 WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    finally
      spark.catalog.dropTempView(v): Unit
  }

  /** Q44 explicit window frames — the bounded-frame specs the running
    * aggregates (q15, default unbounded-preceding frame) don't cover:
    * a 4-row moving average (`rowsBetween(-3, 0)`) and a value-range
    * count (`rangeBetween(-100, 0)` over the numeric ordering). Frame
    * sums use decimal addends so the moving average is order-exact; the
    * window shuffles once on user_id like every per-user window. */
  def q44WindowFrames(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy(col("event_id"))
    val rowsW = order.rowsBetween(-3, Window.currentRow)
    val rangeW = Window.partitionBy("user_id").orderBy(col("value"))
      .rangeBetween(-100, Window.currentRow)
    Sources.table(spark, dir, "events")
      .select(
        col("event_id"), col("user_id"),
        r4(sum(col("value").cast(Money)).over(rowsW).cast("double") /
          count(lit(1)).over(rowsW)).as("mavg4"),
        count(lit(1)).over(rangeW).as("n_within_100"))
      .orderBy("event_id")
  }

  /** X5 sketch aggregates — the approximate swap-ins q17 (exact distinct)
    * and q32 (exact percentiles) document: HyperLogLog++ distinct users
    * and a t-digest-style median per event_type. Both sketches are
    * mergeable (map-side partials, no per-group sort or Expand), which
    * is exactly why they're the 100 TB default. Sketch internals differ
    * across engines, so this entry is rows-only at the gate; the error
    * bound vs the exact aggregates is pinned in ApproxSpec instead. */
  def x5SketchAgg(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(2500)).as("approx_p50"))
      .select(col("event_type"), col("approx_users"),
        r4(col("approx_p50")).as("approx_p50"))
      .orderBy("event_type")
}
