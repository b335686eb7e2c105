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
}
