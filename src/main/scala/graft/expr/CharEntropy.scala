package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character-class Shannon entropy: `char_entropy(text)` — the
  * compression-proxy quality signal (low-entropy text is repeated filler or
  * mono-character noise; the Gopher-style corpus filters cut on exactly this
  * class of statistic) over a fixed 28-bucket alphabet: 'a'–'z', space, and
  * one bucket for everything else.
  *
  * Why an Expression: the built-in formulation is 27 chained
  * `length(replace(text, ch, ''))` passes — correct and codegen'd, but it
  * re-walks every document 27 times. This `doGenCode` emits ONE pass over
  * the UTF-8 bytes (code-point steps, so counts and the total length agree
  * with `length()` semantics in both engines) and then folds the 28 bucket
  * terms in a FIXED order: buckets 'a'..'z', space, other, accumulating
  * `h += -(p * ln p)` left-to-right. That order matches the oracle's
  * left-associative `t_a + t_b + … + t_other` sum term-for-term, and
  * skipping a zero count matches adding the SQL CASE's 0.0 exactly (IEEE
  * `x + 0.0 ≡ x` for the non-negative terms here) — so the expression is
  * bit-identical to the composition (LlmSpec asserts it) and the oracle
  * parity argument reduces to the established `ln` cross-engine precedent
  * (q_lm_perplexity, q_word_pmi).
  *
  * Null handling: null text → null (UnaryExpression nullSafeEval); empty
  * text → 0.0 (no bucket has mass; the SQL CASE terms all take the ELSE 0
  * branch the same way). */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val nb = s.numBytes()
    val counts = new Array[Int](28)
    var n = 0
    var i = 0
    while (i < nb) {
      val b0 = s.getByte(i)
      val l = UTF8String.numBytesForFirstByte(b0)
      n += 1
      if (l == 1) {
        if (b0 >= 'a' && b0 <= 'z') counts(b0 - 'a') += 1
        else if (b0 == ' ') counts(26) += 1
        else counts(27) += 1
      } else counts(27) += 1
      i += l
    }
    var h = 0.0
    var k = 0
    while (k < 28) {
      val c = counts(k)
      if (c > 0) {
        val p = c.toDouble / n.toDouble
        h += -(p * java.lang.StrictMath.log(p))
      }
      k += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val nb = ctx.freshName("nb")
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b0 = ctx.freshName("b0")
      val len = ctx.freshName("len")
      val h = ctx.freshName("h")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val p = ctx.freshName("p")
      s"""
         |int $nb = $a.numBytes();
         |int[] $counts = new int[28];
         |int $n = 0;
         |int $i = 0;
         |while ($i < $nb) {
         |  byte $b0 = $a.getByte($i);
         |  int $len = org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte($b0);
         |  $n++;
         |  if ($len == 1) {
         |    if ($b0 >= 'a' && $b0 <= 'z') $counts[$b0 - 'a']++;
         |    else if ($b0 == ' ') $counts[26]++;
         |    else $counts[27]++;
         |  } else $counts[27]++;
         |  $i += $len;
         |}
         |double $h = 0.0;
         |for (int $k = 0; $k < 28; $k++) {
         |  int $c = $counts[$k];
         |  if ($c > 0) {
         |    double $p = (double) $c / (double) $n;
         |    $h += -($p * java.lang.StrictMath.log($p));
         |  }
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
