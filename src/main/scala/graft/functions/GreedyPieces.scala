package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `greedy_pieces(text, vocab)`: subword tokenization by greedy
  * longest-match ("MaxMatch") against a fixed piece vocabulary — the
  * WordPiece INFERENCE algorithm (Wu et al. 2016's decode step; what
  * `BertTokenizer` runs at serving time, minus the `##` continuation
  * marking). Training a vocabulary is a batch job
  * ([[graft.operators.TextAnalysis.bpePairs]] /
  * [[graft.operators.TextAnalysis.vocabTopK]] are the counting passes);
  * APPLYING one is this per-row scan.
  *
  * Semantics (deterministic, engine-replayable):
  *   - the text splits into whitespace words (same tokenizer as
  *     [[ShingleHashes]]);
  *   - within each word, repeatedly emit the LONGEST vocab piece that
  *     prefixes the remaining suffix; if no piece matches, emit the
  *     single sentinel `<unk>` and advance one code point (the
  *     char-fallback variant — more robust at corpus scale than
  *     WordPiece's whole-word-UNK, and exactly replayable in SQL);
  *   - pieces from consecutive words concatenate into one output array.
  *
  * The vocab argument must be a FOLDABLE array<string> (the vocabulary
  * is a static artifact, exactly like a tokenizer's vocab file): it is
  * compiled ONCE on the driver into a first-byte-indexed,
  * length-descending match table, and each row pays only prefix
  * comparisons against pieces that share its leading byte. Why an
  * Expression and not a UDF: the matcher rides the plan as a reference
  * object (no per-row closure dispatch, no Row boxing), the output is
  * built directly as UTF8String slices of the input buffer (zero string
  * materialization for matched pieces), and generated code calls one
  * static method — the plan stays inside whole-stage codegen.
  *
  * Null text → null. Non-literal vocab, non-string input → type error.
  */
case class GreedyPieces(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "greedy_pieces"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, ArrayType(_: StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (_: StringType, ArrayType(_: StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "greedy_pieces: vocab must be a literal (foldable) array<string>")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"greedy_pieces expects (string, array<string>), got (${l.simpleString}, ${r.simpleString})")
    }

  // The compiled matcher: built once per expression instance on the
  // driver (the vocab is foldable), shipped to executors inside the
  // serialized plan, referenced from generated code via addReferenceObj.
  @transient private lazy val matcher: GreedyPieces.Matcher = {
    val arr = right.eval().asInstanceOf[ArrayData]
    GreedyPieces.compile(
      (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString))
  }

  override def nullSafeEval(text: Any, vocab: Any): Any =
    matcher.tokenize(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matcher", matcher, classOf[GreedyPieces.Matcher].getName)
    // vocab's codegen is skipped entirely — it is baked into the matcher
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $m.tokenize($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GreedyPieces =
    copy(left = newLeft, right = newRight)
}

object GreedyPieces {
  val Unk: UTF8String = UTF8String.fromString("<unk>")

  /** First-byte-indexed match table: pieces sharing a leading byte,
    * longest first — the two-level structure a greedy matcher probes.
    * (A full trie would win on enormous vocabs; at real tokenizer sizes
    * — tens of thousands of short pieces spread over 256 buckets — the
    * length-descending scan is a handful of memcmps per position.) */
  final class Matcher(buckets: Array[Array[Array[Byte]]]) extends Serializable {

    /** Greedy longest-match over every whitespace word of `text`. */
    def tokenize(text: UTF8String): ArrayData = {
      val bytes = text.getBytes
      val out = new java.util.ArrayList[UTF8String](bytes.length / 2 + 4)
      var i = 0
      while (i < bytes.length) {
        while (i < bytes.length && isSpace(bytes(i))) i += 1
        if (i < bytes.length) {
          val end = { var j = i; while (j < bytes.length && !isSpace(bytes(j))) j += 1; j }
          var p = i
          while (p < end) {
            val hit = longestAt(bytes, p, end)
            if (hit > 0) {
              out.add(UTF8String.fromBytes(bytes, p, hit))
              p += hit
            } else {
              out.add(Unk)
              p += utf8Len(bytes(p)) // advance one code point
            }
          }
          i = end
        }
      }
      new GenericArrayData(out.toArray)
    }

    /** Length of the longest vocab piece prefixing bytes[p, end), 0 if none. */
    private def longestAt(bytes: Array[Byte], p: Int, end: Int): Int = {
      val bucket = buckets(bytes(p) & 0xff)
      if (bucket == null) return 0
      var k = 0
      while (k < bucket.length) {
        val piece = bucket(k)
        if (piece.length <= end - p && regionMatches(bytes, p, piece)) return piece.length
        k += 1
      }
      0
    }

    private def regionMatches(bytes: Array[Byte], p: Int, piece: Array[Byte]): Boolean = {
      var j = 0
      while (j < piece.length) {
        if (bytes(p + j) != piece(j)) return false
        j += 1
      }
      true
    }

    private def isSpace(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

    private def utf8Len(b: Byte): Int =
      if ((b & 0x80) == 0) 1
      else if ((b & 0xe0) == 0xc0) 2
      else if ((b & 0xf0) == 0xe0) 3
      else if ((b & 0xf8) == 0xf0) 4
      else 1 // invalid lead byte: step one byte, stay deterministic
  }

  /** Compile a vocabulary into the first-byte-indexed, length-descending
    * (ties: lexicographic — irrelevant to matching, fixed for
    * determinism) match table. Empty pieces are dropped. */
  def compile(vocab: Seq[String]): Matcher = {
    val byFirst = vocab.distinct.filter(_.nonEmpty)
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .groupBy(b => b(0) & 0xff)
    val buckets = new Array[Array[Array[Byte]]](256)
    byFirst.foreach { case (b0, pieces) =>
      buckets(b0) = pieces.sortBy(p =>
        (-p.length, p.map(b => f"${b & 0xff}%03d").mkString)).toArray
    }
    new Matcher(buckets)
  }
}
