package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen 16-bit Morton (z-order) interleave of two long columns —
  * the clustering-key hot path behind io_zorder's layout writer.
  *
  * Semantics are EXACTLY the portable 64-term fold in
  * ManifestIO.mortonKey (low 16 bits of each input, x on even bits, y on
  * odd — ZOrderSpec asserts bit-for-bit parity), but evaluated with the
  * classic mask-spread: 4 shift-or-mask rounds per axis instead of 32
  * shift/and/multiply terms, inside whole-stage codegen. On a clustered
  * write the key is computed once per row of the full corpus, so constant
  * factors matter.
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"morton_interleave requires two BIGINT arguments, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "morton_interleave"

  @inline private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |long $x = $a & 0xFFFFL;
         |$x = ($x | ($x << 8)) & 0x00FF00FFL;
         |$x = ($x | ($x << 4)) & 0x0F0F0F0FL;
         |$x = ($x | ($x << 2)) & 0x33333333L;
         |$x = ($x | ($x << 1)) & 0x55555555L;
         |long $y = $b & 0xFFFFL;
         |$y = ($y | ($y << 8)) & 0x00FF00FFL;
         |$y = ($y | ($y << 4)) & 0x0F0F0F0FL;
         |$y = ($y | ($y << 2)) & 0x33333333L;
         |$y = ($y | ($y << 1)) & 0x55555555L;
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)
}
