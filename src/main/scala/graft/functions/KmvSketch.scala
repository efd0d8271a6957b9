package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `kmv_sketch(hash, k)` — k-minimum-values cardinality sketch
  * (Bar-Yossef et al., RANDOM'02): keep the k smallest DISTINCT hash
  * values of the input. `(k-1) / normalized_kth_min` estimates the
  * distinct count; fewer than k kept values means the count is exact.
  *
  * Why this next to Spark's HyperLogLog (`approx_count_distinct`,
  * B14): HLL's estimate depends on engine-internal hashing and bias
  * correction, so q14b can only be rows-checked. KMV over an EXPLICIT
  * hash column is a pure function of the input set — any engine
  * replays the same k minima and the same one-division estimate, so
  * the sketch gets a full value oracle (ext80). Same scale shape as
  * HLL: fixed k-long state per group, map-side partial aggregation,
  * merge = set-union-then-trim; the shuffle carries ≤ k longs per
  * (group, map task) no matter how many rows stream through.
  *
  * Input must be the hash ALREADY (LongType, e.g. a 60-bit
  * `conv(substr(md5(x),1,15),16,10)` — both engines spell that);
  * duplicates collapse in the sketch's sorted set, nulls are skipped.
  * Returns the kept values as a sorted ascending `array<long>`.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if k > 0 => TypeCheckResult.TypeCheckSuccess
    case LongType => TypeCheckResult.TypeCheckFailure(s"kmv_sketch: k must be positive, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects a LONG hash column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size() < k) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size() > k) buf.remove(buf.last()) }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other)
    while (buf.size() > k) buf.remove(buf.last())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 } // TreeSet iterates ascending
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren(0))
}
