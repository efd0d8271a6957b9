package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd Bloom-sketch membership test over a string column —
  * the vectorized-path form of the decontamination prefilter
  * ([[graft.operators.Dedup.contaminatedBloom]], streaming st33).
  *
  * `bloom_might_contain(sketch_bytes, text)`: `sketch_bytes` is a BINARY
  * LITERAL holding a serialized `org.apache.spark.util.sketch.BloomFilter`
  * (`BloomFilter.writeTo`); `text` is the probed column. Returns whether
  * the sketch might contain the UTF-8 bytes of `text` — bit-identical to
  * `BloomFilter.mightContainString`, which hashes exactly those bytes
  * (so a sketch built by `DataFrame.stat.bloomFilter` over the same
  * column probes consistently).
  *
  * Why an Expression and not a typed `Dataset.filter` lambda: the lambda
  * forces a DeserializeToObject/SerializeFromObject pair around the
  * corpus scan — every row is decoded to a Scala tuple and re-encoded,
  * breaking whole-stage codegen for the ONE scan that reads the full
  * 100 TB corpus. This form keeps the scan → project → filter pipeline
  * inside one codegen stage (PlanAuditSpec pins the absence of
  * DeserializeToObject), with the deserialized sketch attached as a
  * codegen reference object, probed directly on the row's `UTF8String`
  * bytes with no per-row allocation beyond the byte copy the hash needs.
  *
  * The sketch literal rides the serialized plan to executors (the same
  * transport Spark's own runtime-filter `BloomFilterMightContain` uses);
  * it is benchmark-sized (KB–MB), never corpus-sized. Deserialization
  * happens once per (executor, task-closure) via the transient lazy
  * below, not per row.
  */
case class BloomMightContain(bloom: Expression, value: Expression)
    extends BinaryExpression with Serializable {

  override def left: Expression = bloom
  override def right: Expression = value
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!bloom.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain: the sketch argument must be a foldable binary " +
          "literal (serialize the BloomFilter at plan-build time)")
    else if (bloom.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain: sketch must be BINARY, got ${bloom.dataType.simpleString}")
    else if (value.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain: probe value must be STRING, got ${value.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val filter: BloomFilter = {
    val bytes = bloom.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_might_contain: sketch literal is null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(bfBytes: Any, v: Any): Any =
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) =>
      s"${ev.value} = $bfRef.mightContainBinary($v.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(bloom = newLeft, value = newRight)
}
