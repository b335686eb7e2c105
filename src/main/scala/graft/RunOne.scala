package graft

import org.apache.spark.sql.SparkSession

/** Focused single-query dump: `runMain graft.RunOne <name> <sfDir> <outDir>`
  * writes one SparkEntry query's result to `outDir/<name>` parquet — the
  * fast inner loop for validating a new entry against the DuckDB oracle
  * without paying a full Verify pass. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.tuned(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    // a one-entry oracle_sql.json makes check_oracle.py check just this
    // query against the same outDir
    Verify.writeOracleJson(outDir,
      SparkEntry.oracleSql.view.filterKeys(_ == name).toMap)
    spark.stop()
  }
}
