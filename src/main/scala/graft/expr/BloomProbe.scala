package graft.expr

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a serialized `BloomFilter` sketch:
  * `bloom_probe(key_string, sketch_binary)` → boolean. The sketch argument
  * must be foldable (a literal carrying the bytes a distributed
  * `df.stat.bloomFilter` build produced) — the same ship-the-sketch-in-the-
  * plan mechanism Spark's own runtime bloom-filter joins use. Each task
  * deserializes the sketch once (transient lazy, re-initialized per
  * executor after plan deserialization), then probes are zero-allocation
  * byte-hash tests inside whole-stage codegen — this removes the one Scala
  * UDF the library ever had ([[graft.queries.Llm.qDedupBloom]]'s map-side
  * gate), restoring the "no UDFs anywhere" invariant PlanAuditSpec asserts.
  *
  * Probing hashes the key's UTF-8 bytes, identical to
  * `mightContainString` (BloomFilter.putString is defined as the UTF-8
  * byte insertion), so results match the stat-built sketch exactly. */
case class BloomProbe(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, BinaryType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_probe sketch argument must be a literal (foldable)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_probe requires (string, binary), got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Called from both eval paths; public-to-codegen via the reference obj. */
  def probe(key: UTF8String): Boolean = bloom.mightContainBinary(key.getBytes)

  override def nullSafeEval(a: Any, b: Any): Any =
    probe(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS expression: the sketch deserializes once per task via
    // the transient lazy, and generated code stays a single virtual call
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomProbe].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $ref.probe($a);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
