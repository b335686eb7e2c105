package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared test fixture: one SparkSession for the whole forked test JVM
  * (suites run sequentially in the fork, so no session races). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Engine.tuned(
      SparkSession.builder().master("local[4]").appName("graft-test"),
      shufflePartitions = 4
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Smoke/equivalence fixture scale. */
  val sf: String = "/root/testdata/sf0.001"

  /** Rows of a frame as order-sensitive comparable vectors. */
  def rows(df: DataFrame): Vector[Vector[Any]] =
    df.collect().map(_.toSeq.toVector).toVector
}
