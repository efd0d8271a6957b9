package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(text, n)`: the DISTINCT word n-gram shingles of a
  * document, each hashed to 64 bits — as one scalar expression.
  *
  * This replaces a 5-operator pipeline (split → transform → array_distinct
  * → explode → groupBy/collect_set) whose groupBy was a FULL-CORPUS
  * shuffle: the shingle-set frame becomes a pure projection of the scan,
  * so MinHash/SimHash dedup needs zero shuffles until the (tiny) banded
  * candidate join. At 100 TB that removes the single largest exchange of
  * the dedup pipeline.
  *
  * Tokenization: runs of non-whitespace bytes (ASCII whitespace incl.
  * vertical tab, matching regex `\s`); equivalent to splitting on
  * `\s+` and dropping empty tokens — leading whitespace does NOT
  * produce the empty-first-token artifact of `split`. Hash: XXH64 (seed 42) over the UTF-8 bytes of the
  * shingle words joined with single spaces. Output order is sorted
  * (a by-product of dedup) — all consumers are order-independent.
  *
  * Interpreted eval only: this runs once per document (not per pair), so
  * codegen would buy little; the loop itself is already primitive.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(s"shingle_hashes: n must be positive, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects string, got ${t.simpleString}")
  }

  // CodegenFallback: evaluated interpreted inside codegen'd plans —
  // runs once per document (not per pair), so the fallback costs little.
  override def nullSafeEval(input: Any): Any = {
    val hashes = ShingleKernel.posHashes(input.asInstanceOf[UTF8String], n)
    val m = hashes.length
    if (m == 0) return new GenericArrayData(hashes)
    // dedup in place (order-independent consumers)
    java.util.Arrays.sort(hashes)
    var out = 1
    var r = 1
    while (r < m) {
      if (hashes(r) != hashes(r - 1)) { hashes(out) = hashes(r); out += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, out))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `shingle_pos_hashes(text, n)`: every word n-gram of a document hashed
  * to 64 bits, in TOKEN-POSITION order and WITHOUT dedup — element `i`
  * (0-based) is the hash of the n-gram starting at token `i`. Same
  * tokenizer and hash as [[ShingleHashes]] (XXH64 seed 42 over the
  * space-joined shingle bytes); only the post-processing differs, so the
  * two expressions agree on which n-grams a document contains.
  *
  * This is the building block for POSITIONAL analyses — duplicated-span
  * detection needs to know WHERE a repeated n-gram sits, which the
  * set-shaped [[ShingleHashes]] deliberately discards. */
case class ShinglePosHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_pos_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(s"shingle_pos_hashes: n must be positive, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_pos_hashes expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleKernel.posHashes(input.asInstanceOf[UTF8String], n))

  override protected def withNewChildInternal(newChild: Expression): ShinglePosHashes =
    copy(child = newChild)
}

/** Shared tokenize-and-hash loop for the shingle expressions. */
private[functions] object ShingleKernel {

  /** Hash of each word n-gram in position order (index = 0-based start
    * token); fewer than n words → empty. */
  def posHashes(input: UTF8String, n: Int): Array[Long] = {
    val bytes = input.getBytes
    // word boundaries: runs of non-whitespace
    var starts = new Array[Int](16); var ends = new Array[Int](16)
    var nw = 0
    var i = 0
    def isSpace(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B
    while (i < bytes.length) {
      while (i < bytes.length && isSpace(bytes(i))) i += 1
      if (i < bytes.length) {
        val s = i
        while (i < bytes.length && !isSpace(bytes(i))) i += 1
        if (nw == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nw * 2)
          ends = java.util.Arrays.copyOf(ends, nw * 2)
        }
        starts(nw) = s; ends(nw) = i; nw += 1
      }
    }
    if (nw < n) return Array.empty[Long]

    val m = nw - n + 1
    val hashes = new Array[Long](m)
    val buf = new Array[Byte](bytes.length + n) // shingle scratch, max size
    var w = 0
    while (w < m) {
      var len = 0
      var j = 0
      while (j < n) {
        if (j > 0) { buf(len) = ' '; len += 1 }
        val wl = ends(w + j) - starts(w + j)
        System.arraycopy(bytes, starts(w + j), buf, len, wl)
        len += wl
        j += 1
      }
      hashes(w) = XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      w += 1
    }
    hashes
  }
}
