package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items sketch — the bounded-memory heavy-hitter
  * AGGREGATE ([[BoundedTopKAgg]] bounds per-group top-k by VALUE; this
  * bounds global top items by FREQUENCY).
  *
  * The exact formulation (`GROUP BY item HAVING count > t`) shuffles
  * one record per DISTINCT item — at 100 TB with a high-cardinality
  * key (URLs, user ids, n-grams) that is the whole key space on the
  * wire to find a handful of hot items. This sketch holds at most
  * `capacity` counters per partial buffer, merges buffer-into-buffer,
  * and ships `capacity` entries per map task TOTAL — the classic
  * candidates pass of the two-phase heavy-hitter plan (see
  * [[graft.operators.HeavyHitters]] for the exact-verify second pass).
  *
  * Guarantees (Misra–Gries 1982; merge per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): after any sequence of updates and merges
  * over N non-null rows, every surviving counter satisfies
  * `true_count - N/(capacity+1) <= est <= true_count`, and EVERY item
  * with `true_count > N/(capacity+1)` is present — candidate recall
  * is 1.0 by pigeonhole, the property the verify pass relies on.
  *
  * Input: one expression of any atomic, hashable type (string /
  * integral / fractional / decimal / date / timestamp / boolean;
  * binary is rejected — Java arrays compare by identity). NULLs are
  * ignored. Output: `array<struct<item, est>>`, estimate-descending
  * (ties by item ascending) — deterministic for a FIXED buffer, but
  * estimates depend on partition layout; treat them as candidates +
  * lower bounds, not exact counts.
  */
case class FreqSketchAgg(child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", child.dataType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "freq_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // hashable scalar types only: binary (Java array — identity
    // equality) and nested types are rejected
    case _: NumericType | StringType | BooleanType | DateType |
         TimestampType | TimestampNTZType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a hashable scalar type, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty[Any, Long]

  override def update(buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // lookup with the BORROWED value (content equality); deep-copy
      // only on actual insertion — the hot-item fast path allocates
      // nothing
      buf.get(v) match {
        case Some(c) => buf.update(v, c + 1L)
        case None if buf.size < capacity =>
          buf.update(InternalRow.copyValue(v), 1L)
        case None =>
          // full sketch, unseen item: decrement every counter (the new
          // item's implicit counter hits zero immediately). O(capacity)
          // here, but each decrement cancels a prior increment, so the
          // amortized cost per row stays O(1).
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, Long],
      other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c) // deserialized keys owned
    }
    if (buf.size > capacity) {
      // mergeable-summaries reduction: subtract the (capacity+1)-th
      // largest count from everything and drop the non-positives —
      // at most `capacity` survive and the error bound telescopes
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (capacity + 1))
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.filterInPlace((_, c) => c > 0L)
    }
    buf
  }

  @transient private lazy val itemOrdering =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val entries = buf.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      if (c1 != c2) c1 > c2 else itemOrdering.compare(i1, i2) < 0
    }
    new GenericArrayData(entries.map { case (item, est) =>
      InternalRow(item, est): Any
    })
  }

  @transient private lazy val proj =
    UnsafeProjection.create(Array(child.dataType, LongType))

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, count) =>
      val unsafe = proj(InternalRow(item, count))
      val bytes = unsafe.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val unsafe = new UnsafeRow(2)
      unsafe.pointTo(rowBytes, len)
      buf.update(InternalRow.copyValue(unsafe.get(0, child.dataType)),
        unsafe.getLong(1))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)
}
