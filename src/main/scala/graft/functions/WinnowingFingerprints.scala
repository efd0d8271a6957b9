package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fps(text, k, w)`: the document's winnowing fingerprints
  * (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS algorithm): hash
  * every k-char gram, slide a window of w consecutive gram hashes, keep
  * each window's minimum. Guarantee: any shared substring of length
  * ≥ w + k - 1 between two documents yields at least one shared
  * fingerprint, while storing only ~2/(w+1) of all gram hashes.
  *
  * Hashing is XXH64 per k-gram (O(k) per position instead of a true O(1)
  * rolling recurrence — at k=12 the difference is noise, and XXH64's
  * distribution is far better than a Rabin power sum).
  * Output: distinct fingerprints, sorted (order-independent consumers).
  */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 0 && w > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps: k and w must be positive, got k=$k w=$w")
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val m = bytes.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i, k, 42L)
      i += 1
    }
    val nWin = math.max(1, m - w + 1)
    val picked = new Array[Long](nWin)
    var p = 0
    while (p < nWin) {
      var best = hs(p)
      var j = p + 1
      val end = math.min(p + w, m)
      while (j < end) { if (hs(j) < best) best = hs(j); j += 1 }
      picked(p) = best
      p += 1
    }
    java.util.Arrays.sort(picked)
    var out = 1
    var r = 1
    while (r < nWin) {
      if (picked(r) != picked(r - 1)) { picked(out) = picked(r); out += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(picked, out))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowingFingerprints =
    copy(child = newChild)
}
