package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sources
import graft.ops.Relational

/** The SQL catalog surface: [[Engine.registerViews]] exposes every fixture
  * table as a temp view, and gate-equivalent queries written in plain
  * Spark SQL must return exactly what the DataFrame entries return — same
  * scans, same pushdowns, same canonicalization, one engine with two
  * faces. Views are session-scoped, so the suite runs in a child session
  * and leaks nothing into the shared catalog.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val sql = {
    val child = spark.newSession()
    Engine.registerViews(child, sf)
    child
  }

  test("registerViews exposes every fixture table") {
    val views = sql.catalog.listTables().collect().map(_.name).toSet
    assert(Sources.tableNames.toSet.subsetOf(views),
      s"missing views: ${Sources.tableNames.toSet -- views}")
    // and the ts normalization applies through the view, not just the API
    assert(sql.sql("SELECT ts FROM events").schema.head.dataType.typeName == "timestamp")
  }

  test("q01 via spark.sql ≡ DataFrame gate entry") {
    val viaSql = sql.sql(
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'click' AND value > 10 ORDER BY event_id""".stripMargin)
    assert(rows(viaSql) == rows(Relational.q01ScanFilter(spark, sf)))
  }

  test("q11 via spark.sql ≡ DataFrame gate entry") {
    val viaSql = sql.sql(
      """SELECT n_name,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
    assert(rows(viaSql) == rows(Relational.q11Join3Way(spark, sf)))
  }

  test("q12 via spark.sql ≡ DataFrame gate entry") {
    val viaSql = sql.sql(
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(l_discount) AS DOUBLE) AS avg_disc,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin)
    assert(rows(viaSql) == rows(Relational.q12PricingSummary(spark, sf)))
  }

  test("q17 via spark.sql ≡ DataFrame gate entry") {
    val viaSql = sql.sql(
      """SELECT event_type, count(DISTINCT user_id) AS dusers
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    assert(rows(viaSql) == rows(Relational.q17DistinctExact(spark, sf)))
  }

  // ---- LLM-pipeline flagships: a pipeline owner drives the corpus-prep
  // operators from plain SQL over the registered views — same engine,
  // same rows as the DataFrame gate entries.

  test("d1 exact dedup via spark.sql ≡ DataFrame gate entry") {
    val viaSql = sql.sql(
      """SELECT min(doc_id) AS keep_id, count(*) AS dup_cnt
        |FROM documents
        |GROUP BY md5(trim(lower(regexp_replace(text, '\\s+', ' '))))
        |ORDER BY keep_id""".stripMargin)
    assert(rows(viaSql) == rows(graft.ops.DedupOps.d1Exact(spark, sf)))
  }

  test("t10 gopher rules via spark.sql ≡ DataFrame gate entry") {
    val viaSql = sql.sql(
      s"""WITH tok AS (SELECT lang, source,
         |  filter(split(lower(text), '[^a-z0-9]+'), t -> t != '') AS ts FROM documents),
         |m AS (SELECT lang, source, CAST(size(ts) AS BIGINT) AS wc,
         |  aggregate(transform(ts, t -> CAST(length(t) AS BIGINT)), 0L, (a, x) -> a + x) AS sum_len,
         |  CAST(size(filter(ts, t -> t IN (${graft.ops.TextOps.StopList.map(s => s"'$s'").mkString(", ")}))) AS BIGINT) AS n_stop,
         |  aggregate(array_sort(ts), named_struct('prev', '', 'run', 0L, 'best', 0L),
         |    (a, x) -> named_struct('prev', x,
         |      'run', if(x = a.prev, a.run + 1L, 1L),
         |      'best', greatest(a.best, if(x = a.prev, a.run + 1L, 1L))),
         |    a -> a.best) AS max_run
         |  FROM tok WHERE size(ts) > 0)
         |SELECT lang, source, count(*) AS n_docs,
         |  sum(if(wc >= ${graft.ops.TextOps.MinWords}, 1L, 0L)) AS p_wc,
         |  sum(if(sum_len * 10 >= wc * 42 AND sum_len * 10 <= wc * 52, 1L, 0L)) AS p_mean,
         |  sum(if(n_stop >= ${graft.ops.TextOps.MinStops}, 1L, 0L)) AS p_stop,
         |  sum(if(max_run * 8 <= wc, 1L, 0L)) AS p_top,
         |  sum(if(wc >= ${graft.ops.TextOps.MinWords}
         |    AND sum_len * 10 >= wc * 42 AND sum_len * 10 <= wc * 52
         |    AND n_stop >= ${graft.ops.TextOps.MinStops}
         |    AND max_run * 8 <= wc, 1L, 0L)) AS p_all
         |FROM m GROUP BY lang, source ORDER BY lang, source""".stripMargin)
    assert(rows(viaSql) == rows(graft.ops.TextOps.t10GopherRules(spark, sf)))
  }

  test("t14 mixture sampling via spark.sql ≡ DataFrame gate entry") {
    val (m, mul) = (graft.ops.TextOps.MixHashMod, graft.ops.TextOps.MixHashMul)
    val viaSql = sql.sql(
      s"""WITH d AS (SELECT source, doc_id,
         |  CAST(substring(source, 4, 10) AS BIGINT) % 4 + 1 AS w FROM documents),
         |cnt AS (SELECT source, first(w) AS w, count(*) AS n_docs FROM d GROUP BY source),
         |r AS (SELECT source, w, n_docs, least(1.0, w * c / n_docs) AS rate
         |  FROM (SELECT *, min(n_docs / w) OVER () AS c FROM cnt)),
         |k AS (SELECT d.source, CAST(d.doc_id % ${m}L * ${mul}L % ${m}L AS DOUBLE) < r.rate * $m AS kept, r.rate
         |  FROM d JOIN r ON r.source = d.source)
         |SELECT source, count(*) AS n_docs, sum(if(kept, 1L, 0L)) AS n_kept,
         |  round(first(rate), 6) AS rate
         |FROM k GROUP BY source ORDER BY source""".stripMargin)
    assert(rows(viaSql) == rows(graft.ops.TextOps.t14MixSample(spark, sf)))
  }
}
