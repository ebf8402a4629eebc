package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram generator: `word_ngrams(tokens, n)` emits the array of
  * space-joined n-token shingles — the gram unit under `q_decontaminate`,
  * `q_span_dup`, and the curation funnel's contamination stage.
  *
  * Why an Expression: the HOF formulation
  * `transform(sequence(1, size(w)-n+1), i -> array_join(slice(w, i, n), ' '))`
  * allocates a sequence array and runs an interpreted lambda (slice copy +
  * join) per position — Spark's higher-order functions never enter
  * whole-stage codegen bodies. This `doGenCode` emits one tight loop over
  * the backing array with a single `UTF8String.concatWs` per gram.
  * Output is bit-identical to the HOF form (same strings, same order,
  * duplicates preserved — LlmSpec asserts equality), and a doc shorter than
  * n yields an EMPTY array — which also retires the descending-`sequence`
  * hazard the guarded HOF form had to work around.
  *
  * Null handling: null token array → null (UnaryExpression nullSafeEval);
  * `split` never produces null elements, and concatWs skips them like
  * array_join would. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_ngrams n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_ngrams"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements() - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m)
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
      val m = ctx.freshName("m")
      val res = ctx.freshName("res")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $m = $a.numElements() - $n + 1;
         |if ($m < 0) $m = 0;
         |$utf8[] $res = new $utf8[$m];
         |$utf8[] $parts = new $utf8[$n];
         |for (int $i = 0; $i < $m; $i++) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $a.getUTF8String($i + $j);
         |  }
         |  $res[$i] = $utf8.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
