package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.{Comparator, PriorityQueue => JPriorityQueue}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** `top_k_by(ord, payload, k [, 'desc'|'asc'])` — bounded-heap top-k
  * aggregate (SURVEY §2B B18/B19 scale path).
  *
  * The idiomatic SQL form of "top k rows per key" is
  * `row_number() OVER (PARTITION BY key ORDER BY ord) <= k`, which
  * shuffles EVERY input row to its key's reducer and sorts there (Spark's
  * `InferWindowGroupLimit` inserts a map-side group-limit since 3.5, but
  * the map side still buffers and sorts its whole partition slice). This
  * aggregate instead rides the normal two-phase aggregation: each task
  * keeps a k-entry binary heap per key (O(n log k), no sort), and the
  * shuffle carries AT MOST k rows per (key, map task) — at 100 TB with
  * k=3 that's the difference between exchanging the full fact table and
  * exchanging a few KB per key per task.
  *
  * Determinism contract: `ord` must be a TOTAL order over the group's
  * rows (pass `struct(ord_col, unique_tiebreak)`) — with duplicate ord
  * values the k-boundary evictions are heap-arrival-order dependent,
  * same caveat as DuckDB's `arg_max(x, ord, k)`.
  *
  * Returns `array<struct<ord, item>>` sorted by ord (descending for
  * 'desc'/largest — the default); explode + `item.*` restores rows.
  * Null `ord` rows are skipped (the `max_by`/`min_by` convention); null
  * payloads are kept.
  */
case class TopKBy(
    ord: Expression,
    payload: Expression,
    k: Int,
    largest: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JPriorityQueue[TopKBy.Entry]] {

  override def children: Seq[Expression] = Seq(ord, payload)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", ord.dataType, nullable = false),
      StructField("item", payload.dataType, nullable = payload.nullable))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) {
      TypeCheckResult.TypeCheckFailure(s"top_k_by: k must be positive, got $k")
    } else {
      TypeUtils.checkForOrderingExpr(ord.dataType, prettyName)
    }

  /** Ordering on the ord slot (interpreted — runs once per heap sift,
    * not per row field, so interpretation cost is O(log k) comparisons). */
  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ord.dataType)

  /** Heap root = the entry to EVICT next: the smallest kept value when
    * keeping the largest k, and vice versa. */
  @transient private lazy val heapCmp: Comparator[TopKBy.Entry] = {
    val base = ordering
    if (largest) (a: TopKBy.Entry, b: TopKBy.Entry) => base.compare(a.ord, b.ord)
    else (a: TopKBy.Entry, b: TopKBy.Entry) => base.compare(b.ord, a.ord)
  }

  override def createAggregationBuffer(): JPriorityQueue[TopKBy.Entry] =
    new JPriorityQueue[TopKBy.Entry](k + 1, heapCmp)

  override def update(
      buffer: JPriorityQueue[TopKBy.Entry],
      input: InternalRow): JPriorityQueue[TopKBy.Entry] = {
    val o = ord.eval(input)
    if (o != null) {
      if (buffer.size() < k) {
        buffer.add(new TopKBy.Entry(
          InternalRow.copyValue(o), InternalRow.copyValue(payload.eval(input))))
      } else {
        val worst = buffer.peek()
        val cmp = ordering.compare(o, worst.ord)
        if (if (largest) cmp > 0 else cmp < 0) {
          buffer.poll()
          buffer.add(new TopKBy.Entry(
            InternalRow.copyValue(o), InternalRow.copyValue(payload.eval(input))))
        }
      }
    }
    buffer
  }

  override def merge(
      buffer: JPriorityQueue[TopKBy.Entry],
      other: JPriorityQueue[TopKBy.Entry]): JPriorityQueue[TopKBy.Entry] = {
    val it = other.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (buffer.size() < k) {
        buffer.add(e) // already owned copies (deserialized or buffer-local)
      } else {
        val worst = buffer.peek()
        val cmp = ordering.compare(e.ord, worst.ord)
        if (if (largest) cmp > 0 else cmp < 0) {
          buffer.poll()
          buffer.add(e)
        }
      }
    }
    buffer
  }

  override def eval(buffer: JPriorityQueue[TopKBy.Entry]): Any = {
    val arr = buffer.toArray(new Array[TopKBy.Entry](buffer.size()))
    // Output best-first: descending for largest-k, ascending for smallest.
    java.util.Arrays.sort(arr, heapCmp.reversed())
    new GenericArrayData(arr.map(e => InternalRow(e.ord, e.value): Any))
  }

  @transient private lazy val proj =
    UnsafeProjection.create(Array(ord.dataType, payload.dataType))
  @transient private lazy val scratchValues = new Array[Any](2)
  @transient private lazy val scratch =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(scratchValues)

  override def serialize(buffer: JPriorityQueue[TopKBy.Entry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) {
      val e = it.next()
      scratchValues(0) = e.ord
      scratchValues(1) = e.value
      val row = proj(scratch)
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): JPriorityQueue[TopKBy.Entry] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val pq = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, len)
      // copyValue: detach struct/string values from the row's backing array
      pq.add(new TopKBy.Entry(
        InternalRow.copyValue(row.get(0, ord.dataType)),
        InternalRow.copyValue(row.get(1, payload.dataType))))
      i += 1
    }
    pq
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKBy =
    copy(ord = newChildren(0), payload = newChildren(1))
}

object TopKBy {
  /** Heap entry: ord + payload, both already detached from input buffers. */
  final class Entry(val ord: Any, val value: Any)
}
