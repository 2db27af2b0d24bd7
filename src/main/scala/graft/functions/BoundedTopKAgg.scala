package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate — the scale-correct per-group top-k.
  *
  * The composable formulations both have an unbounded middle: the
  * window (`row_number() <= k`) SORTS every group's full row set, and
  * the hash-agg trick (`slice(array_sort(collect_list(..)), 1, k)`)
  * MATERIALIZES every group's full row set inside the aggregation
  * buffer before sorting — at 100 TB a hot group's buffer is the OOM.
  * This aggregate keeps a bounded k-element heap PER GROUP at every
  * stage: update evicts the current maximum once k elements are held,
  * partial buffers merge heap-into-heap, and only k rows per group
  * ever exist in memory or on the shuffle wire — the per-group
  * generalization of what TakeOrderedAndProject does globally.
  *
  * Input is a single (possibly struct) expression; ordering is the
  * natural Catalyst ordering of its type (struct = lexicographic by
  * field — encode "descending by score" by negating the score field,
  * exactly as the composable variants do). Output: the k smallest
  * values, ascending, as `array<childType>`.
  *
  * Buffers serialize as [count, [len, UnsafeRow bytes]*] via an
  * UnsafeProjection — the standard TypedImperativeAggregate contract
  * for shuffle-safe partial states.
  *
  * Spark ships a private equivalent (`CollectTopK`, backing
  * `ListAgg`-style internals) with the same bounded-buffer idea; this
  * class is graft's own so the ordering contract (natural ascending,
  * struct = lexicographic — matching `array_sort` and the external
  * oracles' `ORDER BY`) and the wire format stay under the engine's
  * control rather than a private API's.
  */
case class BoundedTopKAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "bounded_topk"

  /** Analysis-time orderability check: a MAP (or other unordered)
    * child must fail with a clean AnalysisException at plan time, not
    * a MatchError from inside an executor task when the lazy ordering
    * first forces. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val isStruct = child.dataType.isInstanceOf[StructType]

  @transient private lazy val ordering: Ordering[InternalRow] = {
    val ord = TypeUtils.getInterpretedOrdering(child.dataType)
    new Ordering[InternalRow] {
      // struct ordering compares the rows themselves; a primitive
      // ordering compares VALUES, so unwrap the 1-field carrier row
      override def compare(a: InternalRow, b: InternalRow): Int =
        if (isStruct) ord.compare(a, b)
        else ord.compare(a.get(0, child.dataType), b.get(0, child.dataType))
    }
  }

  @transient private lazy val proj =
    UnsafeProjection.create(Array(child.dataType))

  // PriorityQueue dequeues the LARGEST under `ordering` — exactly the
  // element to evict when a smaller candidate arrives
  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](ordering)

  /** Insert an ALREADY-OWNED (deep-copied or buffer-owned) row. */
  private def insertOwned(buf: mutable.PriorityQueue[InternalRow],
      value: InternalRow): Unit = {
    if (buf.size < k) buf.enqueue(value)
    else if (ordering.compare(value, buf.head) < 0) {
      buf.dequeue()
      buf.enqueue(value)
    }
  }

  override def update(buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      // wrap WITHOUT copying first: the evaluated value is valid for
      // the duration of this call, so test admission on the raw value
      // and deep-copy only on actual enqueue — for a skewed group far
      // past k, almost every row is rejected and pays zero allocation
      val candidate = v match {
        case r: InternalRow => r
        case other => InternalRow(other)
      }
      val admit = buf.size < k || ordering.compare(candidate, buf.head) < 0
      if (admit) {
        // deep-copy rows AND buffer-backed scalars (UTF8String, arrays)
        // before retaining across rows
        val owned = v match {
          case r: InternalRow => r.copy()
          case other => InternalRow(InternalRow.copyValue(other))
        }
        insertOwned(buf, owned)
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach(insertOwned(buf, _)) // deserialized rows are owned
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any = {
    val sorted = buf.toArray.sorted(ordering)
    val values: Array[Any] = child.dataType match {
      case _: StructType => sorted.map(identity[Any])
      case _ => sorted.map(_.get(0, child.dataType))
    }
    new GenericArrayData(values)
  }

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { row =>
      // project through a 1-col struct so ANY child type serializes
      val unsafe = proj(InternalRow(
        if (isStruct) row else row.get(0, child.dataType)))
      val bytes = unsafe.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val unsafe = new UnsafeRow(1)
      unsafe.pointTo(rowBytes, len)
      val value = unsafe.get(0, child.dataType)
      val row = value match {
        case r: InternalRow => r.copy()
        case other => InternalRow(other)
      }
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopKAgg =
    copy(child = newChildren.head)
}
