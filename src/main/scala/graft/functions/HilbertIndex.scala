package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd HILBERT-CURVE index over k range-bucketed
  * coordinates (`array<long>`, each in `[0, 2^bits)`) — the layout key
  * behind `Sinks.clusterHilbert`, the multi-column clustering pass that
  * keeps locality where Z-ordering loses it: the Z-curve's bit
  * interleave takes long diagonal jumps between quadrant boundaries, so
  * at skewed aspect ratios (one hot column range, one wide) file min/max
  * ranges stay loose on the wide column; the Hilbert curve moves ONE
  * unit step at a time (every consecutive pair of positions differs in
  * exactly one coordinate by exactly 1 — pinned in HilbertIndexSpec), so
  * range-partitioned files cover compact axis-aligned blobs on every
  * clustered column at once. The same reason the table formats grew
  * `OPTIMIZE ... ZORDER` → Hilbert variants.
  *
  * Algorithm: Skilling's axes→transpose transform (J. Skilling,
  * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — the
  * standard constant-space n-dimensional form) followed by the bit
  * interleave of the transpose. Pure integer bit arithmetic, one fused
  * loop, no allocation beyond the k-element scratch — and a STATIC
  * method, so codegen is a single call that stays inside whole-stage
  * codegen exactly like the built-in hash expressions.
  *
  * `bits` is a literal; k·bits ≤ 62 keeps the index in a positive Long
  * (the same budget the Z-order path enforces). Out-of-range
  * coordinates are an ERROR, not a wrapped position: a bucket outside
  * `[0, 2^bits)` means the caller's min/max scaling is broken, and a
  * silently folded position would scatter the file layout. */
case class HilbertIndex(coords: Expression, bits: Int)
    extends UnaryExpression with Serializable {

  override def child: Expression = coords
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  require(bits >= 1 && bits <= 62,
    s"hilbert_index: bits must be in [1, 62], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = coords.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hilbert_index expects array<bigint> coordinates, got ${other.simpleString}")
  }

  override def nullSafeEval(c: Any): Any =
    HilbertIndex.compute(c.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HilbertIndex.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(coords = newChild)
}

object HilbertIndex {
  /** Skilling axes→transpose + interleave. Static so generated code
    * calls it directly. */
  def compute(coords: ArrayData, bits: Int): Long = {
    val n = coords.numElements()
    require(n >= 1 && n.toLong * bits <= 62,
      s"hilbert_index: need 1 <= k and k*bits <= 62, got k=$n bits=$bits")
    val x = new Array[Long](n)
    val max = 1L << bits
    var i = 0
    while (i < n) {
      if (coords.isNullAt(i)) throw new IllegalArgumentException(
        s"hilbert_index: null coordinate at dim $i — a silently-zeroed " +
          "position would scatter the file layout")
      x(i) = coords.getLong(i)
      if (x(i) < 0 || x(i) >= max) throw new IllegalArgumentException(
        s"hilbert_index: coordinate ${x(i)} outside [0, $max) at dim $i " +
          "(broken min/max bucket scaling upstream)")
      i += 1
    }
    // inverse undo excess work
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transpose: bit b of x(0) is the most significant
    var h = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) {
        h = (h << 1) | ((x(i) >>> b) & 1L)
        i += 1
      }
      b -= 1
    }
    h
  }
}
