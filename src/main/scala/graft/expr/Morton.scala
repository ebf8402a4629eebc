package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Morton (Z-order) code: `morton32(x, y)` interleaves the low 16
  * bits of two int keys — x on even bit positions, y on odd — into one
  * BIGINT sort key. Sorting/range-partitioning by this key clusters rows
  * that are close in BOTH dimensions into the same files, so min/max file
  * statistics prune 2-D range predicates the way a single-column sort only
  * prunes its own column — the lakehouse OPTIMIZE ZORDER layout technique,
  * here as a first-class expression ([[graft.queries.Relational.qZorderLayout]];
  * WarehouseSpec measures the clustering with per-partition span sums).
  *
  * Pure integer bit math — bit-identical across engines by construction
  * (the oracle restates it as a 32-term sum of disjoint powers of two) and
  * trivially inside whole-stage codegen. Null in either key → null. */
case class Morton32(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "morton32 requires two int arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "morton32"

  override def nullSafeEval(a: Any, b: Any): Any =
    Morton32.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |int $x = $a & 0xFFFF;
         |int $y = $b & 0xFFFF;
         |long $z = 0L;
         |for (int $i = 0; $i < 16; $i++) {
         |  $z |= ((long) (($x >> $i) & 1)) << (2 * $i);
         |  $z |= ((long) (($y >> $i) & 1)) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Morton32 {
  /** The ONE definition of the bit interleave, shared by the interpreted
    * eval above and [[graft.etl.ZOrder.ranges]]' decomposition — the probe's
    * exact-cover contract depends on both computing the identical code, so
    * they must not drift independently (the codegen string and the oracle's
    * 32-term sum necessarily remain independent restatements, pinned by
    * WarehouseSpec and the driver oracle respectively). */
  def interleave(xRaw: Int, yRaw: Int): Long = {
    val x = xRaw & 0xFFFF
    val y = yRaw & 0xFFFF
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1).toLong << (2 * i)
      z |= ((y >> i) & 1).toLong << (2 * i + 1)
      i += 1
    }
    z
  }
}
