package graft.out

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic-output helpers (SURVEY.md §2.4 determinism contract).
  *
  * The correctness gate hash-compares our results against a DuckDB oracle,
  * so floating-point aggregation must not depend on partitioning / merge
  * order. The trick: cast each addend to DECIMAL(18,4) *before* summing.
  * Fixture money/quantity columns carry ≤4 true decimal digits, and the
  * per-value double error (~1e-12 relative) is far below the 1e-4 grid, so
  * both engines recover the same exact decimal per row; decimal addition is
  * then associative/commutative → bit-identical totals at any parallelism.
  * This property survives a 1000-executor shuffle, unlike double sums.
  */
object Canonical {
  val Money: DecimalType = DecimalType(18, 4)

  /** Order-independent exact sum of a ≤4-decimal-digit double column. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Order-independent mean via exact decimal sum / count. */
  def davg(c: Column): Column =
    (sum(c.cast(Money)).cast(DoubleType) / count(c)).cast(DoubleType)

  /** Output-edge rounding for derived ratios. */
  def r4(c: Column): Column = round(c, 4)

  /** Canonical BIGINT for any integral output column. */
  def asLong(c: Column): Column = c.cast(LongType)
}
