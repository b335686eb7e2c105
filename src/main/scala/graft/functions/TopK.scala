package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** `graft_topk(expr, k)`: a BOUNDED, map-side-combinable top-k
  * aggregate — the k largest values of an orderable expression, emitted
  * as one array sorted descending.
  *
  * Exists for the bulk-retrieval read (s21's "top-k neighbours for
  * EVERY corpus vector"): the rank-window formulation re-exchanges and
  * sorts the full candidate-pair set by query id before discarding all
  * but k rows per query, and `slice(array_sort(collect_list(...)))`
  * holds every candidate in the aggregation buffer — unbounded state,
  * the thing that OOMs on a dense cell at 100 TB. This aggregate's
  * buffer NEVER exceeds k values: each partial (map-side) fold keeps a
  * k-slot sorted insert, partials merge in O(k), and the final exchange
  * moves k rows per group instead of one per candidate pair.
  *
  * Ordering is the type's own interpreted ordering (same total order as
  * `max(struct(...))`), so callers express tie-breaks exactly as the
  * struct-max idiom does — e.g. `struct(c, -n_id, n_id)` ranks by
  * (c DESC, n_id ASC). Null inputs are skipped (SQL aggregate
  * convention: max/min ignore nulls), and `k` must be a foldable
  * positive integer — it sizes a per-group buffer, never data.
  *
  * Spark ships no bounded top-k aggregate (collect_list is unbounded;
  * max_by is k=1); this is the standard TypedImperativeAggregate shape
  * Spark's own percentile/collect aggregates use, registered by
  * [[GraftExtensions]] so it is first-class in SQL and the Column API.
  */
case class TopK(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] {

  // k is a plan-time constant: it sizes the buffer, so a non-foldable k
  // would make state bounds data-dependent — exactly what this exists
  // to prevent. Checked in checkInputDataTypes before first use.
  lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!RowOrderingUtil.isOrderable(child.dataType))
      return TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires an orderable value, got ${child.dataType.simpleString}")
    if (kExpr.dataType != IntegerType || !kExpr.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_topk requires a foldable integer k")
    if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Int] <= 0)
      return TypeCheckResult.TypeCheckFailure(
        "graft_topk requires k > 0")
    TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  /** Sorted-descending k-slot insert: linear scan for the insertion
    * point (k is small by contract), drop the tail past k. A value no
    * better than the current k-th of a FULL buffer is rejected with one
    * comparison — the hot path on dense groups. */
  private def insert(buf: mutable.ArrayBuffer[Any], value: Any): mutable.ArrayBuffer[Any] = {
    if (buf.length >= k && ordering.compare(value, buf.last) <= 0) return buf
    var i = buf.length
    while (i > 0 && ordering.compare(value, buf(i - 1)) > 0) i -= 1
    buf.insert(i, value)
    if (buf.length > k) buf.remove(k)
    buf
  }

  override def update(buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v == null) buf
    // unsafe rows/arrays are reused by the caller — copy what we keep
    else insert(buf, InternalRow.copyValue(v))
  }

  override def merge(buf: mutable.ArrayBuffer[Any], other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  private lazy val bufferProjection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] =
    bufferProjection(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < arr.numElements()) {
      buf += InternalRow.copyValue(arr.get(i, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopK =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** `RowOrdering.isOrderable` lives in catalyst's expressions package as
  * an object method; aliased here to keep the import surface local. */
private[functions] object RowOrderingUtil {
  def isOrderable(dt: DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)
}
