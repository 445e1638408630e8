package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen Hamming distance of two equal-length ASCII strings —
  * the number of positions whose characters differ.
  *
  * Third native scalar Expression (after VectorDot and MortonInterleave),
  * built for the bit-sliced fingerprint hot path: SimHash/phash near-dup
  * candidates carry their 64-char '0'/'1' fingerprints through a band
  * join, and the verify step scores every candidate pair — at 100 TB the
  * candidate set IS the workload, and the portable formulation
  * (`aggregate(sequence(1, 64), 0, (acc, i) -> acc + IF(substr = substr,
  * 0, 1))`) runs as an interpreted lambda frame with two fresh substring
  * allocations per position (the repo's measured HOF penalty class). The
  * codegen loop compares raw bytes in place.
  *
  * BYTE semantics: positions are bytes, which equals characters exactly
  * for the ASCII fingerprint alphabet this exists for (DuckDB's
  * `hamming()` — the oracle side — likewise requires equal lengths and
  * compares code units). Unequal byte lengths throw, like the oracle.
  * NULL if either side is NULL.
  */
case class HammingStr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hamming_str requires two STRING arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_str"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val n = x.numBytes()
    require(y.numBytes() == n,
      s"hamming_str: length mismatch $n vs ${y.numBytes()}")
    var acc = 0
    var i = 0
    while (i < n) {
      if (x.getByte(i) != y.getByte(i)) acc += 1
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numBytes();
         |if ($b.numBytes() != $n) {
         |  throw new IllegalArgumentException(
         |    "hamming_str: length mismatch " + $n + " vs " + $b.numBytes());
         |}
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getByte($i) != $b.getByte($i)) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HammingStr =
    copy(left = newLeft, right = newRight)
}
