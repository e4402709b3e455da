package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Native Catalyst expression for the int8-code dot product — the hot
  * inner loop of quantized similarity search (`Similarity.simTopkInt8`).
  *
  * Semantically identical to the portable higher-order-function form
  *
  *   aggregate(zip_with(a, b, (x,y) -> bigint(x)*bigint(y)),
  *             0L, (acc,v) -> acc + v)
  *
  * but compiled into whole-stage codegen: one fused primitive loop per
  * row instead of interpreted lambda evaluation. Unlike the float
  * path (DotF32), the arithmetic is EXACT — 64-dim products of
  * ±127 codes peak at 64·127² ≈ 1.03M, nowhere near long overflow —
  * so result stability needs no accumulation-order discipline at all;
  * the left-to-right loop is kept anyway for symmetry with the HOF
  * form the DuckDB oracle mirrors.
  *
  * Null semantics match the HOF form exactly: NULL if either array is
  * NULL, if lengths differ (zip_with pads with NULL), or if any
  * element is NULL (NULL poisons the fold).
  */
case class DotI8(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  // Registered as SQL `dot_i8`: validate strictly (see DotF32 — an
  // ARRAY<INT> input would silently read garbage via getByte on the
  // UnsafeArrayData path).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isByteArray(t: DataType) = t match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    if (isByteArray(left.dataType) && isByteArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_i8 requires (ARRAY<TINYINT>, ARRAY<TINYINT>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((long) $a.getByte($i)) * ((long) $b.getByte($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_i8"
}

object DotI8 {
  /** Untyped NULL literals analyze to NULL instead of failing the
    * strict check (same convenience cast as DotF32.normNull). */
  private[functions] def normNull(e: Expression): Expression =
    if (e.resolved && e.dataType == NullType)
      Cast(e, ArrayType(ByteType))
    else e

  /** Column-API entry point over two ARRAY<TINYINT> columns. */
  def dotI8(a: Column, b: Column): Column =
    ExpressionUtils.column(DotI8(
      normNull(ExpressionUtils.expression(a)),
      normNull(ExpressionUtils.expression(b))))
}
