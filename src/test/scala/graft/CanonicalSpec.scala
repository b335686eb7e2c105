package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.out.Canonical

/** The determinism cornerstone: Canonical.dsum must be invariant to
  * partitioning / merge order (the property every oracle hash-match
  * rests on), and exactly equal to a BigDecimal reference sum. */
class CanonicalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def fourDp(seed: Long, n: Int): Seq[Double] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(math.round((rnd.nextDouble() - 0.5) * 2e7) / 1e4) // ±1000.0000
  }

  test("dsum is identical across partition counts and equals the BigDecimal sum") {
    for (seed <- Seq(1L, 42L, 777L)) {
      val xs = fourDp(seed, 5000)
      val expected = xs.map(x => BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val sums = Seq(1, 7, 32).map { parts =>
        spark.sparkContext.parallelize(xs, parts).toDF("x")
          .agg(Canonical.dsum(col("x")).as("s")).collect()(0).getDouble(0)
      }
      assert(sums.distinct.size == 1, s"seed $seed: partition-dependent sums $sums")
      assert(sums.head == expected, s"seed $seed: ${sums.head} != $expected")
    }
  }

  test("davg equals decimal-sum / count") {
    val xs = fourDp(7L, 999)
    val expected = (xs.map(x => BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      / BigDecimal(xs.size)).toDouble
    val got = spark.sparkContext.parallelize(xs, 13).toDF("x")
      .agg(Canonical.davg(col("x")).as("a")).collect()(0).getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }
}
