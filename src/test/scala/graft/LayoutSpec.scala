package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sources

/** Data-layout levers for the 100 TB design: static partition pruning,
  * dynamic partition pruning (DPP), and bucketed shuffle-free joins.
  *
  * These don't surface in the per-query gates (the fixture layout is one
  * parquet file per table), but they are the difference between scanning
  * 100 TB and scanning the 2 TB a query actually touches — so the engine
  * proves here, on real written layouts, that its plans engage each
  * lever. A pipeline owner points `Sinks`-written tables at the same
  * layouts (`partitionBy` on coarse keys like date/type; `bucketBy` on
  * high-cardinality join keys).
  */
class LayoutSpec extends AnyFunSuite {
  import TestSpark._

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(FormattedMode)
  }

  private lazy val partDir: String = {
    val dir = Files.createTempDirectory("graft_part_").toString + "/events"
    Sources.table(spark, sf, "events")
      .write.partitionBy("event_type").parquet(dir)
    dir
  }

  test("a filter on the partition column prunes partitions at the scan") {
    val df = spark.read.parquet(partDir)
      .filter(col("event_type") === "click")
      .agg(count(lit(1)).as("cnt"))
    val plan = finalPlan(df)
    assert(plan.contains("PartitionFilters"), "scan has no partition filters")
    // Hive-style layout: the pruned scan must read only the one matching
    // directory, visible as the partition count in the scan node.
    assert(plan.contains("isnotnull(event_type"),
      "partition predicate absent from PartitionFilters")
    val expected = Sources.table(spark, sf, "events")
      .filter(col("event_type") === "click").count()
    assert(df.collect().head.getLong(0) == expected)
  }

  test("a dim-side filter prunes fact partitions dynamically (DPP)") {
    // The q36 pattern at scale: the fact table is partitioned on the join
    // key's domain, the selective filter sits on the dim side, and the
    // runtime subquery prunes fact partitions before the scan.
    val dim = Sources.table(spark, sf, "events")
      .select(col("event_type").as("d_type")).distinct()
      .filter(col("d_type").isin("click", "purchase"))
    val fact = spark.read.parquet(partDir)
    val joined = fact.join(dim, col("event_type") === col("d_type"))
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
    val plan = finalPlan(joined)
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      "no dynamic partition pruning in the fact scan — the dim filter " +
        "would not cut the 100 TB scan")
    assert(joined.collect().map(_.getString(0)).toSet == Set("click", "purchase"))
  }

  test("d12's band store layout: batch-partitioned + band-bucketed, candidate join has no store-side exchange") {
    // The scaladoc claim behind d12/p3's 100 TB story, proven on the real
    // store layout: the persisted MinHash band store is partitioned by
    // arrival batch (reads prune `batch_id < current` — retry safety AND
    // partition pruning) and bucketed by the candidate join key, so the
    // per-batch candidate join shuffles ONLY the incoming batch's band
    // rows; the store — the side that grows with the corpus — is read
    // co-located, never re-shuffled.
    import graft.ops.DedupOps
    val bands = DedupOps.bandRows(DedupOps.shingles(
        Sources.table(spark, sf, "documents")))
      .withColumn("batch_id", (col("doc_id") / lit(125)).cast("int"))
    // the store grows by per-batch APPENDS, exactly like processBatch
    bands.filter(col("batch_id") < 2)
      .write.mode("overwrite").partitionBy("batch_id")
      .bucketBy(4, "bi", "bv").sortBy("bi", "bv")
      .saveAsTable("band_store_b")
    bands.filter(col("batch_id") === 2)
      .write.mode("append").partitionBy("batch_id")
      .bucketBy(4, "bi", "bv").sortBy("bi", "bv")
      .saveAsTable("band_store_b")
    try {
      val child = spark.newSession()
      child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // single-tree plan (AQE's formatted output repeats the tree as
      // Final + Initial, double-counting exchanges textually)
      child.conf.set("spark.sql.adaptive.enabled", "false")
      val store = child.table("band_store_b").filter(col("batch_id") < 3)
      val batch = DedupOps.bandRows(DedupOps.shingles(
        Sources.table(child, sf, "documents").filter(col("doc_id") >= 375)))
      val cand = batch.as("x").join(store.as("y"),
          col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
            col("y.doc_id") < col("x.doc_id"))
        .select(col("y.doc_id").as("a_id"), col("x.doc_id").as("b_id"))
      cand.collect()
      val plan = cand.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "store scan does not report a bucketed read")
      assert(plan.contains("PartitionFilters") && plan.contains("batch_id"),
        "store scan is not pruned on the batch partition column")
      // exactly ONE band-key exchange: the batch side. A second would mean
      // the store — the corpus-sized side at 100 TB — is re-shuffled per
      // batch, the cost the bucketed layout exists to remove.
      // FormattedMode prints keys on the node's Arguments line
      val nBandExchanges = "hashpartitioning\\(bi".r.findAllMatchIn(plan).length
      assert(nBandExchanges == 1,
        s"expected 1 band-key exchange (batch side only), got $nBandExchanges")
    } finally {
      spark.sql("DROP TABLE IF EXISTS band_store_b")
      ()
    }
  }

  test("s11's index store layout: batch-partitioned + cell-bucketed, probe joins with no exchange at all") {
    // The scaladoc claim behind s11's 100 TB story, proven on the real
    // store layout: the ANN index store is partitioned by arrival batch
    // and bucketed by cell — and since BOTH probe sides read from the
    // store (queries are indexed vectors too), the inverted-list join is
    // bucket-local with ZERO exchanges: nothing corpus-sized ever moves
    // at query time.
    import graft.ops.SimilarityOps
    val all = SimilarityOps.normed(spark, sf)
    val assigned = SimilarityOps
      .assignCells(all, SimilarityOps.ivfSeedCentroids(all))
      .withColumn("batch_id", (col("vec_id") % 4).cast("int"))
    // the store grows by per-batch APPENDS, exactly like processBatch
    assigned.filter(col("batch_id") < 3)
      .write.mode("overwrite").partitionBy("batch_id")
      .bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("ann_index_b")
    assigned.filter(col("batch_id") === 3)
      .write.mode("append").partitionBy("batch_id")
      .bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("ann_index_b")
    try {
      val child = spark.newSession()
      child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      child.conf.set("spark.sql.adaptive.enabled", "false")
      val store = child.table("ann_index_b").filter(col("batch_id") < 4)
      val q = store.filter(col("label") === 1)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell"))
      val pairs = store.join(q, Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"))
      pairs.collect()
      val plan = pairs.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "store scan does not report a bucketed read")
      assert(plan.contains("PartitionFilters") && plan.contains("batch_id"),
        "store scan is not pruned on the batch partition column")
      val nCellExchanges = "hashpartitioning\\(cell".r.findAllMatchIn(plan).length
      assert(nCellExchanges == 0,
        s"expected a fully bucket-local probe, got $nCellExchanges cell exchanges")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_index_b")
      ()
    }
  }

  test("s21's bulk probe on the bucketed store: two-sided corpus join with zero cell exchanges") {
    // s21's production plan: the corpus side reads its STORED cell
    // assignment, and at batch-inference cardinalities the QUERY side is
    // the same store — so when the store is cell-bucketed, the two-sided
    // join (the gate's one data exchange) disappears entirely: both
    // sides read bucket-co-located, pair generation moves nothing, and
    // the only exchange left in the whole plan is the one-row-per-query
    // q_id aggregation the struct max reduces to.
    import graft.ops.SimilarityOps
    val all = SimilarityOps.normed(spark, sf)
    val assigned = SimilarityOps
      .assignCells(all, SimilarityOps.ivfSeedCentroids(all))
    assigned.write.mode("overwrite")
      .bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("ann_bulk_b")
    try {
      val child = spark.newSession()
      child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      child.conf.set("spark.sql.adaptive.enabled", "false")
      val store = child.table("ann_bulk_b")
      val corpus = store
        .select(col("cell"), col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn"))
      val queries = store
        .select(col("cell"), col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      val best = queries.join(corpus, Seq("cell"))
        .filter(col("n_id") =!= col("q_id"))
        .withColumn("c",
          SimilarityOps.dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
        .groupBy("q_id")
        .agg(max(struct(col("c"), (-col("n_id")).as("ni"), col("n_id"))).as("b"))
        .select(col("q_id"), col("b.n_id").as("n_id"))
      best.collect()
      val plan = best.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "store scan does not report a bucketed read")
      val nCellExchanges = "hashpartitioning\\(cell".r.findAllMatchIn(plan).length
      assert(nCellExchanges == 0,
        s"expected a fully bucket-local two-sided join, got $nCellExchanges cell exchanges")
      assert(plan.contains("partial_max"),
        "bulk top-1 lost its map-side partial aggregation on the bucketed plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_bulk_b")
      ()
    }
  }

  test("s15's multi-probe on the bucketed store: query fan-out rides a broadcast, store never shuffles") {
    // The scaladoc claim behind s15's 100 TB story, on the real written
    // layout: widening the store-served probe to nprobe=2 adds work on
    // the QUERY side only — query rows re-rank the broadcast quantizer
    // and explode to their top-2 cells, then ride a broadcast into the
    // cell equi-join. The corpus-sized store side is read in place: the
    // plan contains ZERO shuffle exchanges of any kind (the only
    // exchange is the query-set broadcast), so serve cost at nprobe=2
    // is the nprobe=1 cost plus a constant-size fan-out.
    import graft.ops.SimilarityOps
    val all = SimilarityOps.normed(spark, sf)
    val seeds = SimilarityOps.ivfSeedCentroids(all)
    val assigned = SimilarityOps.assignCells(all, seeds)
      .withColumn("batch_id", (col("vec_id") % 4).cast("int"))
    assigned.write.mode("overwrite").partitionBy("batch_id")
      .bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("ann_index_np")
    try {
      val child = spark.newSession()
      child.conf.set("spark.sql.adaptive.enabled", "false")
      val store = child.table("ann_index_np").filter(col("batch_id") < 4)
      val childSeeds = SimilarityOps.ivfSeedCentroids(SimilarityOps.normed(child, sf))
      val probe = SimilarityOps.probeAssignedMulti(
        store.drop("batch_id"), childSeeds, nprobe = 2)
      probe.collect()
      val plan = probe.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "store scan does not report a bucketed read")
      val nCellExchanges = "hashpartitioning\\(cell".r.findAllMatchIn(plan).length
      assert(nCellExchanges == 0,
        s"expected zero cell exchanges (fan-out is query-side only), got $nCellExchanges")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_index_np")
      ()
    }
  }

  test("s24's hier multi-probe on the bucketed store: group fan-out rides a broadcast, store never shuffles") {
    // s15's exchange-free claim carried to the two-level quantizer: the
    // hier store's cell column is what the probe joins on, so the
    // quantizer swap is invisible to the layout story — query rows
    // re-rank the broadcast codebook, explode to their top-2 groups'
    // level-2 argmax cells, and ride a broadcast into the bucket-local
    // cell equi-join. ZERO shuffle exchanges on the corpus side.
    import graft.ops.SimilarityOps
    val all = SimilarityOps.normed(spark, sf)
    val seeds = SimilarityOps.ivfSeedCentroids(all)
    val assigned = SimilarityOps
      .hierAssignCells(all, seeds, SimilarityOps.HierSub)
      .withColumn("batch_id", (col("vec_id") % 4).cast("int"))
    assigned.write.mode("overwrite").partitionBy("batch_id")
      .bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("ann_index_hier_np")
    try {
      val child = spark.newSession()
      child.conf.set("spark.sql.adaptive.enabled", "false")
      val store = child.table("ann_index_hier_np").filter(col("batch_id") < 4)
      val childAll = SimilarityOps.normed(child, sf)
      val arr = SimilarityOps.hierCentArr(
        SimilarityOps.ivfSeedCentroids(childAll), SimilarityOps.HierSub)
      val probe = SimilarityOps.probeAssignedHierMulti(
        store.drop("batch_id"), arr,
        graft.streaming.StreamAnnIngest.HierGprobe)
      probe.collect()
      val plan = probe.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "store scan does not report a bucketed read")
      val nCellExchanges = "hashpartitioning\\(cell".r.findAllMatchIn(plan).length
      assert(nCellExchanges == 0,
        s"expected zero cell exchanges (group fan-out is query-side only), got $nCellExchanges")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_index_hier_np")
      ()
    }
  }

  test("s12's tombstone layout: cell-bucketed merge + probe with zero exchanges") {
    // The scaladoc claim behind s12's 100 TB story: tombstones CARRY
    // THEIR CELL and ride the same batch-partitioned + cell-bucketed
    // layout as the index, so the probe-time merge (anti-join on
    // (cell, vec_id) — cell is a bucket-subset of the join keys) and
    // the inverted-list probe after it are both bucket-local: the
    // whole delete-aware query plan moves nothing corpus-sized.
    //
    // The deployment recipe REQUIRES
    // `spark.sql.requireAllClusterKeysForCoPartition=false` (set below,
    // and documented in StreamAnnIngest's scaladoc): by default Spark
    // only accepts co-partitioning on ALL join keys, and the buckets
    // cover only `cell`. The relaxation is semantically sound here —
    // HashPartitioning(cell) places every (cell, vec_id) group in one
    // partition, which is all the anti-join needs — and without it the
    // corpus-sized index would re-shuffle on every delete-aware probe.
    import graft.ops.SimilarityOps
    val all = SimilarityOps.normed(spark, sf)
    val assigned = SimilarityOps
      .assignCells(all, SimilarityOps.ivfSeedCentroids(all))
      .withColumn("batch_id", (col("vec_id") % 4).cast("int"))
    assigned.write.mode("overwrite").partitionBy("batch_id")
      .bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("ann_index_t")
    assigned.filter(col("vec_id") % 10 === 7 && col("label") === 0)
      .select(col("vec_id"), col("cell"), col("batch_id"))
      .write.mode("overwrite").partitionBy("batch_id")
      .bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("ann_tombs_t")
    try {
      val child = spark.newSession()
      child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      child.conf.set("spark.sql.adaptive.enabled", "false")
      child.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      val store = child.table("ann_index_t").filter(col("batch_id") < 4)
      val tombs = child.table("ann_tombs_t").filter(col("batch_id") < 4)
      val live = store.join(tombs, Seq("cell", "vec_id"), "left_anti")
      val q = live.filter(col("label") === 1)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell"))
      val pairs = live.join(q, Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"))
      pairs.collect()
      val plan = pairs.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "store scan does not report a bucketed read")
      val nCellExchanges = "hashpartitioning\\(cell".r.findAllMatchIn(plan).length
      assert(nCellExchanges == 0,
        s"expected a fully bucket-local merge+probe, got $nCellExchanges cell exchanges")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_index_t")
      spark.sql("DROP TABLE IF EXISTS ann_tombs_t")
      ()
    }
  }

  test("s16's version-tombstone layout: 3-key merge + probe with zero exchanges") {
    // The scaladoc claim behind s16's 100 TB story, on the real written
    // layout: the upsert tombstone keys on the victim's full physical
    // address (cell, vec_id, batch_id) — one more key than s12's — and
    // the merge must STILL be bucket-local on a cell-bucketed store:
    // HashPartitioning(cell) clusters every (cell, vec_id, batch_id)
    // group, so trailing keys change no exchange structure under the
    // relaxed subset-key co-partition rule.
    import graft.ops.SimilarityOps
    val all = SimilarityOps.normed(spark, sf)
    val assigned = SimilarityOps
      .assignCells(all, SimilarityOps.ivfSeedCentroids(all))
      .withColumn("batch_id", (col("vec_id") % 4).cast("int"))
    assigned.write.mode("overwrite").partitionBy("batch_id")
      .bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("ann_index_u")
    // version-tombstones: the update rule's victims with their full
    // physical address (store batch_id replayed as victim_batch)
    assigned.filter(col("vec_id") % 10 === 3 && col("label") === 0)
      .select(col("cell"), col("vec_id"), col("batch_id").as("victim_batch"),
        col("batch_id"))
      .write.mode("overwrite").partitionBy("batch_id")
      .bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("ann_tombs_u")
    try {
      val child = spark.newSession()
      child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      child.conf.set("spark.sql.adaptive.enabled", "false")
      child.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      val store = child.table("ann_index_u").filter(col("batch_id") < 4)
      val tombs = child.table("ann_tombs_u").filter(col("batch_id") < 4)
        .select(col("cell"), col("vec_id"), col("victim_batch").as("batch_id"))
      val live = store.join(tombs, Seq("cell", "vec_id", "batch_id"), "left_anti")
      val q = live.filter(col("label") === 1)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell"))
      val pairs = live.join(q, Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"))
      pairs.collect()
      val plan = pairs.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "store scan does not report a bucketed read")
      val nCellExchanges = "hashpartitioning\\(cell".r.findAllMatchIn(plan).length
      assert(nCellExchanges == 0,
        s"expected a fully bucket-local 3-key merge+probe, got $nCellExchanges cell exchanges")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_index_u")
      spark.sql("DROP TABLE IF EXISTS ann_tombs_u")
      ()
    }
  }

  test("s13's compacted layout: bucketed rewrite, probe exchange-free with no anti-join") {
    // The scaladoc claim behind s13's 100 TB story, on the real written
    // layout: compaction rewrites the batch-partitioned store as ONE
    // cell-bucketed table with tombstoned rows dropped. After that the
    // delete-aware probe is just s11's probe again — no anti-join in
    // the plan at all (the merge was paid once, at compaction) and zero
    // exchanges (both probe sides read the same cell-bucketed store).
    import graft.ops.SimilarityOps
    val all = SimilarityOps.normed(spark, sf)
    val assigned = SimilarityOps
      .assignCells(all, SimilarityOps.ivfSeedCentroids(all))
    val tombstoned = assigned
      .filter(col("vec_id") % 10 === 7 && col("label") === 0)
      .select(col("vec_id"), col("cell"))
    // the compaction rewrite: survivors only, bucketed on cell — the
    // production recipe for StreamAnnIngest.s13's cell-partitioned write
    assigned.join(tombstoned, Seq("cell", "vec_id"), "left_anti")
      .write.mode("overwrite")
      .bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("ann_compact_b")
    try {
      val child = spark.newSession()
      child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      child.conf.set("spark.sql.adaptive.enabled", "false")
      val store = child.table("ann_compact_b")
      val q = store.filter(col("label") === 1)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell"))
      val pairs = store.join(q, Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"))
      pairs.collect()
      val plan = pairs.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "store scan does not report a bucketed read")
      assert(!plan.contains("Anti"),
        "compacted probe still carries a tombstone anti-join — " +
          "compaction failed to retire the merge")
      val nCellExchanges = "hashpartitioning\\(cell".r.findAllMatchIn(plan).length
      assert(nCellExchanges == 0,
        s"expected a fully bucket-local compacted probe, got $nCellExchanges cell exchanges")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_compact_b")
      ()
    }
  }

  test("s14's mixed layout: compacted + uncompacted branches probe with zero exchanges, anti-join on the uncompacted branch only") {
    // The scaladoc claim behind s14's 100 TB story, on real written
    // layouts: mid-compaction the index is TWO stores — the compacted
    // subset's cells rewritten into a cell-bucketed survivors table, the
    // remainder still the batch-partitioned store + tombstones. Cells
    // partition the probe (each query's whole candidate set lives on one
    // side), so the serve is a union of two bucket-local branch probes:
    // zero cell exchanges anywhere, and the tombstone anti-join appears
    // exactly once — on the uncompacted branch. Serving capacity during
    // maintenance equals serving capacity before it.
    import graft.ops.SimilarityOps
    val all = SimilarityOps.normed(spark, sf)
    val assigned = SimilarityOps
      .assignCells(all, SimilarityOps.ivfSeedCentroids(all))
      .withColumn("batch_id", (col("vec_id") % 4).cast("int"))
    val tombstoned = assigned
      .filter(col("vec_id") % 10 === 7 && col("label") === 0)
      .select(col("vec_id"), col("cell"), col("batch_id"))
    // the live store + tombstones (uncompacted remainder reads these)
    assigned.write.mode("overwrite").partitionBy("batch_id")
      .bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("ann_index_m")
    tombstoned.write.mode("overwrite").partitionBy("batch_id")
      .bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("ann_tombs_m")
    // the partial rewrite: EVEN cells only, survivors only, cell-bucketed
    assigned.filter(col("cell") % 2 === 0)
      .join(tombstoned.select("cell", "vec_id"), Seq("cell", "vec_id"), "left_anti")
      .write.mode("overwrite")
      .bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("ann_compact_m")
    try {
      val child = spark.newSession()
      child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      child.conf.set("spark.sql.adaptive.enabled", "false")
      child.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      def branchPairs(live: org.apache.spark.sql.DataFrame) = {
        val q = live.filter(col("label") === 1)
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
            col("nrm").as("qn"), col("cell"))
        live.join(q, Seq("cell"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id"))
      }
      val comp = child.table("ann_compact_m")
      val store = child.table("ann_index_m")
        .filter(col("batch_id") < 4 && col("cell") % 2 === 1)
      val tombs = child.table("ann_tombs_m")
        .filter(col("batch_id") < 4 && col("cell") % 2 === 1)
        .select("cell", "vec_id")
      val uncomp = store.join(tombs, Seq("cell", "vec_id"), "left_anti")
      // the compacted branch alone: its merge was paid at rewrite time,
      // so its probe plan contains NO anti-join at all
      val compPairs = branchPairs(comp)
      compPairs.collect()
      assert(!compPairs.queryExecution.explainString(FormattedMode).contains("Anti"),
        "compacted branch still carries a tombstone anti-join")
      val mixed = compPairs.unionByName(branchPairs(uncomp))
      mixed.collect()
      val plan = mixed.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "store scans do not report bucketed reads")
      // the tombstone merge survives only on the uncompacted branch —
      // which instantiates its merged view twice (both probe sides read
      // index-minus-tombstones), so the mixed plan carries exactly the 2
      // anti-join instances of the s12 branch and none from compaction
      // ("LeftAnti (" matches FormattedMode's tree lines only, one per
      // physical instance)
      val nAnti = "LeftAnti \\(".r.findAllMatchIn(plan).length
      assert(nAnti == 2,
        s"expected the uncompacted branch's 2 anti-join instances only, got $nAnti")
      val nCellExchanges = "hashpartitioning\\(cell".r.findAllMatchIn(plan).length
      assert(nCellExchanges == 0,
        s"expected a fully bucket-local mixed probe, got $nCellExchanges cell exchanges")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_index_m")
      spark.sql("DROP TABLE IF EXISTS ann_tombs_m")
      spark.sql("DROP TABLE IF EXISTS ann_compact_m")
      ()
    }
  }

  test("m19's compacted fingerprint store: candidate join + Hamming verify never shuffle the store") {
    // The 100 TB claim behind m15/m19, proven on the REAL compaction
    // output (IncrementalDedup.compactStore on media_id — the verb m19
    // runs): the per-batch additions plan reads the consolidated store
    // with the batch_id prune and moves NOTHING store-sized — the batch
    // bands and the under-cap value set ride broadcasts into the store's
    // exploded-band scan, verified candidates ride a broadcast into the
    // fingerprint fetch, and the only exchanges in the whole plan are
    // the value-space-bounded df aggregation (map-side partial: shuffle
    // rows ≤ distinct band values, never corpus) and the output-sized
    // candidate distinct. Clustering the consolidated partition on
    // media_id (the verify's fetch key) rather than the band key is
    // therefore free for the candidate probe — no store-side exchange
    // exists for a band-key layout to remove.
    import graft.ops.MultimodalOps
    import graft.streaming.{IncrementalDedup, StreamMediaDedup}
    val work = Files.createTempDirectory("graft_fpstore_").toString
    val store = s"$work/fp"
    val fp = MultimodalOps.ahashBandsFrom(
      Sources.table(spark, sf, "documents").select("doc_id", "text"))
    // two shipped arrival batches, then the m19 fold, then a post-fold
    // arrival carrying PLANTED twins of pre-fold objects (same
    // fingerprint, new id) — cross-phase pairs exist by construction,
    // so the zero-exchange plan is proven non-vacuously
    fp.filter(col("media_id") % 2 === 0)
      .write.parquet(s"$store/batch_id=0")
    fp.filter(col("media_id") % 2 === 1)
      .write.parquet(s"$store/batch_id=1")
    IncrementalDedup.compactStore(spark, store, "media_id")
    val twins = fp.filter(col("media_id") < 50)
      .withColumn("media_id", col("media_id") + lit(10000000L))
    twins.write.parquet(s"$store/batch_id=2")
    val parts = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    assert(parts == Set("batch_id=-1", "batch_id=2"),
      s"compaction did not leave the expected partitions: $parts")
    val child = spark.newSession()
    child.conf.set("spark.sql.adaptive.enabled", "false")
    val stored = child.read.parquet(store).filter(col("batch_id") <= 2L)
    val (arrived, bandsAll, bandsB, dfBatch) =
      StreamMediaDedup.storeFrames(stored, 2L)
    val okBatch = dfBatch.filter(col("df") <= MultimodalOps.AHashDfMax)
      .select("bi", "bv")
    val added = StreamMediaDedup.additionsFrom(arrived, bandsAll, bandsB, okBatch)
    val got = added.collect()
    // non-vacuity: the planted twins' pairs came through the compacted
    // partition (their earlier side lives ONLY in batch_id=-1)
    assert(got.count(r => r.getLong(1) >= 10000000L) >= 40,
      s"planted cross-phase twins missing from additions (${got.length} rows)")
    val plan = added.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PartitionFilters") && plan.contains("batch_id"),
      "store scan is not pruned on the batch partition column")
    val nStoreEx = "hashpartitioning\\(media_id".r.findAllMatchIn(plan).length
    assert(nStoreEx == 0,
      s"expected zero store-key exchanges (the store is never re-shuffled), got $nStoreEx")
    val nBandEx = "hashpartitioning\\(bi".r.findAllMatchIn(plan).length
    assert(nBandEx == 1,
      s"expected exactly the df aggregation's band-key exchange, got $nBandEx")
    assert(plan.contains("partial_count"),
      "df aggregation lost its map-side partial — the band-key exchange " +
        "would shuffle corpus rows, not value-space rows")
    val nBhj = "BroadcastHashJoin".r.findAllMatchIn(plan).length
    assert(nBhj >= 4,
      s"expected the batch/value/candidate sides to ride broadcasts, got $nBhj BHJs")
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(wh.nonEmpty)
    val buckets = 4
    Sources.table(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(buckets, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    Sources.table(spark, sf, "lineitem")
      .write.mode("overwrite").bucketBy(buckets, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      val child = spark.newSession()
      // force the shuffle-join path so the assertion is about bucketing,
      // not about the broadcast threshold hiding the exchange
      child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = child.table("orders_b")
        .join(child.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      j.collect()
      val plan = j.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // co-bucketed sides: the join's children carry no Exchange — at
      // 100 TB this is the difference between reading co-located buckets
      // and re-shuffling both fact tables per query.
      val joinSection = plan.substring(0, plan.indexOf("HashAggregate"))
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles a side:\n$joinSection")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "scan does not report bucketed read")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("s17's generation store: marker-gated flip, uncommitted rebuild invisible, serve partition-pruned") {
    // The deployment half of s17's retrain: generations land as gen=N
    // partitions, the commit MARKER (not the data files) is what a
    // reader trusts, and the serve prunes every other generation at the
    // scan. Sequence proven on a real written layout: (1) gen-0 serves
    // s3's answer; (2) a gen-1 rebuild whose files have landed but whose
    // marker hasn't stays invisible — the reader still serves gen-0
    // verbatim; (3) the marker create flips the serve to s17's retrained
    // answer atomically.
    import graft.ops.SimilarityOps
    val dir = Files.createTempDirectory("graft_gen_").toString + "/ann_gens"
    val all = SimilarityOps.normed(spark, sf)
    val gen0 = SimilarityOps.assignCells(all, SimilarityOps.ivfSeedCentroids(all))
    SimilarityOps.s17WriteGeneration(gen0, dir, 0)
    def served(): Array[(Long, Long, Double, Long)] =
      SimilarityOps.s17ServeLatest(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    def expect(df: DataFrame): Array[(Long, Long, Double, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val s3Ans = expect(SimilarityOps.s3AnnIvf(spark, sf))
    assert(served().sameElements(s3Ans), "gen-0 serve diverged from s3")
    // rebuild in flight: data files land, marker does not
    SimilarityOps.s17WriteGenData(SimilarityOps.s17Gen1Assigned(spark, sf), dir, 1)
    assert(served().sameElements(s3Ans),
      "uncommitted gen-1 files leaked into the serve — the flip is not marker-gated")
    // crashed-rebuild retry: the data write runs AGAIN before the commit;
    // redo-safety demands the retried generation replace the torn first
    // attempt, not merge with it — a merged (duplicated) store would
    // corrupt the post-flip top-3 below
    SimilarityOps.s17WriteGenData(SimilarityOps.s17Gen1Assigned(spark, sf), dir, 1)
    // the atomic flip: one marker create
    SimilarityOps.s17CommitGen(spark, dir, 1)
    val retrained = expect(SimilarityOps.s17IvfRetrain(spark, sf))
    assert(served().sameElements(retrained), "post-flip serve diverged from s17")
    assert(!served().sameElements(s3Ans),
      "retrain was a no-op on this fixture — the flip test proves nothing")
    // the serve's gen predicate must prune at the scan: a reader pays
    // for ONE generation no matter how many rebuilds have accumulated
    val df = SimilarityOps.s17ServeLatest(spark, dir)
    df.collect()
    val plan = df.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PartitionFilters") && plan.contains("gen"),
      "gen predicate did not reach the scan as a partition filter")
    // vacuum bounds storage: gen-0's data AND marker go, gen-1 survives,
    // and the serve is byte-for-byte undisturbed
    val retired = SimilarityOps.s17VacuumGenerations(spark, dir)
    assert(retired == Seq(0), s"expected to retire gen 0, got $retired")
    val left = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!left.contains("gen=0") && !left.contains("_gen_0_COMMITTED"),
      s"vacuum left gen-0 artifacts behind: $left")
    assert(left.contains("gen=1") && left.contains("_gen_1_COMMITTED"),
      s"vacuum touched the serving generation: $left")
    assert(served().sameElements(retrained), "serve changed after vacuum")
  }

  test("s26's generation flip: the s17 marker machinery serves hier generations unchanged") {
    // the deployment half of the HIER retrain reuses s17's generation
    // store verbatim — the marker-gated flip never looks at how rows got
    // their cell, so the quantizer swap must be invisible to it. Proven
    // on a real written layout with the s17 case's sequence: gen-0 (the
    // seed two-level codebook) serves s22's answer; a gen-1 rebuild
    // (the retrained codebook's assignment) whose files landed but
    // whose marker hasn't stays invisible; the marker create flips the
    // serve to s26's retrained answer.
    import graft.ops.SimilarityOps
    val dir = Files.createTempDirectory("graft_hiergen_").toString + "/hier_gens"
    val all = SimilarityOps.normed(spark, sf)
    val gen0 = SimilarityOps.hierAssignCells(
      all, SimilarityOps.ivfSeedCentroids(all), SimilarityOps.HierSub)
    SimilarityOps.s17WriteGeneration(gen0, dir, 0)
    def served(): Array[(Long, Long, Double, Long)] =
      SimilarityOps.s17ServeLatest(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    def expect(df: DataFrame): Array[(Long, Long, Double, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val s22Ans = expect(SimilarityOps.s22AnnHier(spark, sf))
    assert(served().sameElements(s22Ans), "hier gen-0 serve diverged from s22")
    // rebuild in flight: data files land, marker does not
    SimilarityOps.s17WriteGenData(SimilarityOps.s26Gen1Assigned(spark, sf), dir, 1)
    assert(served().sameElements(s22Ans),
      "uncommitted hier gen-1 files leaked into the serve")
    // the atomic flip: one marker create
    SimilarityOps.s17CommitGen(spark, dir, 1)
    val retrained = expect(SimilarityOps.s26HierRetrain(spark, sf))
    assert(served().sameElements(retrained), "post-flip serve diverged from s26")
    assert(!served().sameElements(s22Ans),
      "hier retrain was a no-op on this fixture — the flip test proves nothing")
  }

  test("a bucketed generation serves s17's probe with zero cell exchanges") {
    // the deployment composition: a generation written cell-bucketed
    // (the s11/s13 store recipe applied to s17's gen-1 rows) must serve
    // the retrained probe with NO exchange on cell — flip atomicity
    // comes from the marker, probe locality from the bucketing, and the
    // two compose because the generation is just a table name away
    import graft.ops.SimilarityOps
    SimilarityOps.s17Gen1Assigned(spark, sf)
      .write.mode("overwrite")
      .bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("ann_gen1_b")
    try {
      val child = spark.newSession()
      child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      child.conf.set("spark.sql.adaptive.enabled", "false")
      val store = child.table("ann_gen1_b")
      val q = store.filter(col("label") === 1)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell"))
      val pairs = store.join(q, Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"))
      pairs.collect()
      val plan = pairs.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "generation scan does not report a bucketed read")
      val nCellExchanges = "hashpartitioning\\(cell".r.findAllMatchIn(plan).length
      assert(nCellExchanges == 0,
        s"expected an exchange-free generation probe, got $nCellExchanges cell exchanges")
      // and the answer is the retrained one: same pair set as s17's probe
      val expect = SimilarityOps.s17IvfRetrain(spark, sf)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(expect.subsetOf(got),
        "bucketed generation probe lost candidate pairs vs s17")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_gen1_b")
      ()
    }
  }
}
