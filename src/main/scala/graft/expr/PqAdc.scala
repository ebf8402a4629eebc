package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Asymmetric-distance (ADC) scoring for product-quantized vectors:
  * `pq_adc(code BINARY(m), lut ARRAY<DOUBLE>(m·k)) → DOUBLE` =
  * `Σ_s lut[s·k + code[s]]`.
  *
  * The LUT is the probe-side half of PQ scoring: for a probe vector q, the
  * driver precomputes `lut[s·k + c] = ⟨q_s, centroid_s(c)⟩` (O(k·D) work on
  * m·k·(D/m) model metadata) so the per-row score is m table lookups and
  * adds — no decode, no float vector read; the scan touches only the m-byte
  * codes. One tight codegen loop, same discipline as [[Int8Dot]]. `k` is
  * inferred per row as `lut.length / code.length`; a code byte is unsigned
  * (`& 0xFF`, codes address up to k=256 entries). */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    // LUT must be null-free: elements feed unchecked getDouble lookups. The
    // driver-built literal LUT is containsNull=false by construction.
    case (BinaryType, ArrayType(DoubleType, false)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "pq_adc requires (binary, array<double> with non-nullable elements), " +
        s"got ${l.catalogString} and ${r.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val code = a.asInstanceOf[Array[Byte]]
    val lut = b.asInstanceOf[ArrayData]
    val m = code.length
    if (m == 0) 0.0
    else {
      val k = lut.numElements() / m
      var acc = 0.0
      var s = 0
      while (s < m) { acc += lut.getDouble(s * k + (code(s) & 0xFF)); s += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      s"""
         |int $m = $a.length;
         |double $acc = 0.0;
         |if ($m > 0) {
         |  int $k = $b.numElements() / $m;
         |  for (int $s = 0; $s < $m; $s++) {
         |    $acc += $b.getDouble($s * $k + ($a[$s] & 0xFF));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
