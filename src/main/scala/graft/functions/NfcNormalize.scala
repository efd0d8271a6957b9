package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * first pass of text canonicalization: a crawled corpus mixes composed
  * and decomposed forms of the same glyph (`é` as U+00E9 vs
  * `e`+U+0301), and every downstream exact-match operator — hash dedup,
  * line dedup, token counts, blocklists — silently treats them as
  * different documents/tokens until the bytes are canonical. NFC is the
  * right form for that: it composes where possible but does NOT fold
  * compatibility characters (ligatures, full-width forms keep their
  * identity — that lossy step is NFKC, a policy decision this operator
  * deliberately leaves out).
  *
  * Why an Expression and not a UDF: the common case — ASCII and
  * already-composed text, i.e. almost every row of a real corpus — is
  * answered by `Normalizer.isNormalized`, a cheap scan that allocates
  * nothing and lets us return the INPUT UTF8String unchanged (zero
  * copy). A UDF would round-trip every row through a String regardless.
  * The JDK implements the Unicode normalization algorithm; DuckDB's
  * `nfc_normalize` (utf8proc) implements the same spec, which is what
  * makes the cross-engine oracle exact.
  *
  * Null → null; non-string input is a type-check error. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by eval and generated code. Fast path: if the
    * text is already NFC (the overwhelming norm), return the input
    * UTF8String itself — no String materialization, no copy. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
