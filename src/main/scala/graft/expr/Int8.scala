package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType, LongType}

/** Symmetric per-vector int8 quantization: `array<float>` → `binary` of the
  * same length, `q_i = round(127 · x_i / max|x|)` (all-zero input → all-zero
  * bytes). The SQ8 storage transform: 4× smaller than float32, and because
  * the per-vector scale is symmetric it CANCELS in cosine — ranking by the
  * quantized dot over quantized norms needs no scale column at all
  * ([[Int8Dot]] + a stored `qnorm`). Codegen emits one tight primitive loop
  * (two passes: max-abs, then quantize) inside whole-stage codegen.
  *
  * [[graft.etl.AnnIndex.quantizeInt8]] is the driver-side twin for probe
  * vectors — same formula, spec-asserted identical. */
case class Int8Pack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_pack requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "int8_pack"

  // A NULL ELEMENT nulls the whole result (checked before getFloat, which
  // would otherwise silently read a null slot as 0.0/garbage): a vector
  // with missing dimensions has no meaningful quantization, and a null
  // row is visible downstream where a corrupted byte vector is not.
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = math.abs(x.getFloat(i).toDouble)
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxAbs > 0.0) {
      i = 0
      while (i < n) {
        out(i) = Math.round(127.0 * x.getFloat(i).toDouble / maxAbs).toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val maxAbs = ctx.freshName("maxAbs")
      val hasNull = ctx.freshName("hasNull")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      // The null-element branch assigns `ev.isNull`, which
      // UnaryExpression.nullSafeCodeGen only DECLARES when the expression is
      // nullable — with containsNull=false on a non-nullable child the
      // variable does not exist, the generated Java would not compile, and
      // janino's fallback silently drops the stage to interpreted mode. A
      // containsNull=false array cannot have null slots, so in that case the
      // check is omitted entirely rather than guarded at runtime.
      val elemNullable = child.dataType match {
        case ArrayType(_, cn) => cn
        case _ => true
      }
      val quantize =
        s"""
           |byte[] $out = new byte[$n];
           |if ($maxAbs > 0.0) {
           |  for (int $i = 0; $i < $n; $i++) {
           |    $out[$i] = (byte) java.lang.Math.round(
           |      127.0 * (double) $a.getFloat($i) / $maxAbs);
           |  }
           |}
           |${ev.value} = $out;
         """.stripMargin
      if (elemNullable)
        s"""
           |int $n = $a.numElements();
           |boolean $hasNull = false;
           |double $maxAbs = 0.0;
           |for (int $i = 0; $i < $n && !$hasNull; $i++) {
           |  if ($a.isNullAt($i)) { $hasNull = true; }
           |  else {
           |    double $v = java.lang.Math.abs((double) $a.getFloat($i));
           |    if ($v > $maxAbs) $maxAbs = $v;
           |  }
           |}
           |if ($hasNull) {
           |  ${ev.isNull} = true;
           |} else {
           |$quantize
           |}
         """.stripMargin
      else
        s"""
           |int $n = $a.numElements();
           |double $maxAbs = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = java.lang.Math.abs((double) $a.getFloat($i));
           |  if ($v > $maxAbs) $maxAbs = $v;
           |}
           |$quantize
         """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer dot product of two int8-packed vectors (`binary` × `binary` →
  * `long`): the coarse-scoring primitive of the SQ8 ANN path. Pure integer
  * multiply-adds over byte arrays in one codegen loop — the memory traffic
  * is a quarter of the float scan, which is the whole point at 100 TB where
  * a brute-force coarse pass is bandwidth-bound, not FLOP-bound. */
case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "int8_dot requires two binary arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "int8_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var dot = 0L
    var i = 0
    while (i < n) { dot += x(i).toLong * y(i).toLong; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (long) $a[$i] * (long) $b[$i];
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
