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
         |  CAST(substring(source, 4) AS BIGINT) % 4 + 1 AS w FROM documents),
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

  test("t16 char-LM scoring via spark.sql ≡ DataFrame gate entry") {
    // the SQL face scores by join + re-aggregate where the gate folds a
    // broadcast map — different plan, identical integers
    val viaSql = sql.sql(
      """WITH nd AS (SELECT doc_id, regexp_replace(lower(text), '[^a-z ]', '') AS norm FROM documents),
        |nd2 AS (SELECT doc_id, norm FROM nd WHERE length(norm) >= 2),
        |bg AS (SELECT doc_id, explode(transform(sequence(1, length(norm) - 1), i -> substring(norm, i, 2))) AS g FROM nd2),
        |model AS (SELECT g, count(*) AS cnt FROM bg GROUP BY g),
        |sc AS (SELECT bg.doc_id, count(*) AS n_bigrams, sum(model.cnt) AS familiarity
        |  FROM bg JOIN model USING (g) GROUP BY bg.doc_id)
        |SELECT doc_id, n_bigrams, familiarity,
        |round(familiarity / n_bigrams, 4) AS mean_fam
        |FROM sc ORDER BY doc_id""".stripMargin)
    assert(rows(viaSql) == rows(graft.ops.TextOps.t16CharLmScore(spark, sf)))
  }

  test("d15 semdedup via spark.sql ≡ DataFrame gate entry (graft_dot through SQL)") {
    // the custom codegen expression is callable from the SQL face, and
    // the row_number assignment picks the identical cells the gate's
    // narrow argmax picks
    val k = graft.ops.SimilarityOps.IvfCells
    val th = graft.ops.SimilarityOps.SemThreshold
    val viaSql = sql.sql(
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v, label FROM embeddings),
         |n AS (SELECT vec_id, v, label, sqrt(graft_dot(v, v)) AS nrm FROM e),
         |seeds AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id < $k),
         |ac AS (SELECT n.vec_id, n.v, n.nrm, s.c_id, graft_dot(n.v, s.cv) / (n.nrm * s.cn) AS ccos FROM n CROSS JOIN seeds s),
         |ar AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, c_id) AS arn FROM ac),
         |asn AS (SELECT vec_id, v, nrm, c_id AS cell, ccos FROM ar WHERE arn = 1),
         |p AS (SELECT a.cell, a.vec_id AS a_id, b.vec_id AS b_id, a.ccos AS acc, b.ccos AS bcc,
         |  graft_dot(a.v, b.v) / (a.nrm * b.nrm) AS cs
         |  FROM asn a JOIN asn b ON a.cell = b.cell AND a.vec_id < b.vec_id),
         |pp AS (SELECT cell, CASE WHEN acc > bcc THEN a_id WHEN acc < bcc THEN b_id ELSE greatest(a_id, b_id) END AS victim
         |  FROM p WHERE cs >= $th),
         |vict AS (SELECT cell, victim FROM pp GROUP BY cell, victim),
         |ndp AS (SELECT cell, count(*) AS n_dropped FROM vict GROUP BY cell),
         |np AS (SELECT cell, count(*) AS n_pairs FROM pp GROUP BY cell),
         |nv AS (SELECT cell, count(*) AS n_vecs FROM asn GROUP BY cell)
         |SELECT nv.cell, nv.n_vecs, coalesce(np.n_pairs, 0L) AS n_pairs,
         |coalesce(ndp.n_dropped, 0L) AS n_dropped,
         |nv.n_vecs - coalesce(ndp.n_dropped, 0L) AS n_kept
         |FROM nv LEFT JOIN np ON np.cell = nv.cell LEFT JOIN ndp ON ndp.cell = nv.cell
         |ORDER BY cell""".stripMargin)
    assert(rows(viaSql) == rows(graft.ops.SimilarityOps.d15SemDedup(spark, sf)))
  }
}
