package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query against
  * `SPARK_GRAFT_SF_DIR`, forcing full execution through a noop sink
  * (count() would let Catalyst prune sorts/projections and under-report).
  * Prints ONE JSON line with per-query wall seconds. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.tuned(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup (BASELINE.md methodology: warm session): first
    // executions pay codegen/JIT and datasource init, which otherwise
    // land on whatever query sorts first. One cheap query per table
    // family warms each scan + expression path over the bench SF dir.
    Seq("q12_pricing_summary", "q03_class_share", "t3_token_count", "s2_ann_bucket")
      .foreach { q =>
        try SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] warmup $q failed: ${e.getMessage}") }
      }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // A failed query must be visibly failed in the JSON: it is listed in
    // "failed", excluded from "queries", and not summed into the total —
    // otherwise a crash reads as a speedup in round-over-round comparisons.
    val qs = results.collect { case (k, v, true) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
