package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `misra_gries(item, k)` / `misra_gries_weighted(item, w, k)` —
  * frequent-items sketch (Misra & Gries, Sci. Comput. Program. 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS'12 §3):
  * maintain at most `k` counters. Both update and merge are ONE rule:
  * add the arriving mass, and while more than k counters remain,
  * subtract the (k+1)-th largest value from all (dropping ≤ 0) — each
  * reduction retires (k+1)·δ total mass, so the total undercount of any
  * item is at most W/(k+1) where W is the total arrived WEIGHT (= the
  * item count n in the unweighted form, where the rule degenerates to
  * the classic decrement-all: the just-inserted unit counter is always
  * the minimum). PODS'12 proves the bound survives arbitrary merge
  * trees — what makes the sketch a map-side-combinable Spark aggregate.
  *
  * Guarantee (the load-bearing one): every item with true total weight
  * > W/(k+1) has a positive counter and IS in the returned candidate
  * array — a superset of the true heavy hitters. The candidate SET
  * itself depends on partition order (like LSH candidates, SURVEY §5
  * nondeterminism); the exact-recount second pass in
  * [[graft.operators.TextAnalysis.heavyHitters]] /
  * [[graft.operators.TextAnalysis.weightedHeavyHitters]] makes the
  * end-to-end operator deterministic and value-oracled.
  *
  * Weights must be POSITIVE longs (a zero/negative/null weight
  * contributes nothing and is skipped — it cannot make an item heavy,
  * and negative mass would break the reduction accounting).
  *
  * Why this next to a plain `groupBy(item).count()` (the
  * [[graft.operators.TextAnalysis.vocabTopK]] shape): the exact
  * aggregate's hash state is one counter per DISTINCT item per map
  * task, and its shuffle carries the whole key domain. Over a bounded
  * vocabulary that is the right plan; over an unbounded domain at
  * 100 TB (URLs, n-grams, session ids) the state and the shuffle are
  * the job-killer. This sketch holds ≤ k counters per partial no matter
  * how many rows stream through, and the shuffle carries ≤ k
  * (string, long) entries per map task — the classic two-pass exact
  * heavy-hitters pattern's first pass.
  *
  * Nulls are skipped (they can never be a frequent ITEM). Returns the
  * candidate items as `array<string>`, ordered by estimate descending
  * then item ascending — deterministic GIVEN the buffer, for stable
  * explain/debug output.
  */
case class MisraGries(
    child: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child, weight)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (child.dataType, weight.dataType) match {
    case (StringType, LongType) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case (StringType, LongType) => TypeCheckResult.TypeCheckFailure(s"misra_gries: k must be positive, got $k")
    case (t, w) => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects (STRING item, LONG weight), got (${t.simpleString}, ${w.simpleString})")
  }

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long]()

  /** The ONE reduction rule (see scaladoc): while > k counters remain,
    * subtract the (k+1)-th largest from all, dropping ≤ 0 — ≤ k
    * survive (those strictly above the cut), error bounds add. */
  private def reduceToK(buf: java.util.HashMap[UTF8String, java.lang.Long]): Unit =
    if (buf.size() > k) {
      val values = new Array[Long](buf.size())
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { values(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(values)
      val cut = values(values.length - (k + 1)) // (k+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - cut
        if (nv <= 0L) eit.remove() else e.setValue(nv): Unit
      }
    }

  override def update(
      buf: java.util.HashMap[UTF8String, java.lang.Long],
      input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    val wv = weight.eval(input)
    if (v != null && wv != null) {
      val w = wv.asInstanceOf[Long]
      if (w > 0L) {
        val s = v.asInstanceOf[UTF8String]
        val cur = buf.get(s)
        if (cur != null) buf.put(s, cur + w)
        // clone: the evaluated UTF8String may alias a reused row buffer
        else {
          buf.put(s.clone(), w)
          // insert-then-reduce: with w = 1 the just-inserted counter IS
          // the minimum, so this degenerates to the classic
          // decrement-all — amortized O(1), each reduction retires
          // (k+1)·cut mass
          reduceToK(buf)
        }
      }
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[UTF8String, java.lang.Long],
      other: java.util.HashMap[UTF8String, java.lang.Long]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    reduceToK(buf)
    buf
  }

  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
    val entries = new java.util.ArrayList[java.util.Map.Entry[UTF8String, java.lang.Long]](buf.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue, a.getValue)
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val arr = new Array[Any](entries.size())
    var i = 0
    while (i < entries.size()) { arr(i) = entries.get(i).getKey; i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren(0), weight = newChildren(1))
}

object MisraGries {
  /** The unweighted form: every item carries unit mass. */
  def apply(child: Expression, k: Int): MisraGries =
    MisraGries(child, org.apache.spark.sql.catalyst.expressions.Literal(1L), k)
}
