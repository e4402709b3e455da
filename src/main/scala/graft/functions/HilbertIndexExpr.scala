package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** 32-bit Hilbert-curve index of two 16-bit bucket ids — the
  * alternative space-filling-curve layout key to `Layout.zorder32`.
  *
  * Z-order is cheap (pure bit dilation) but has long diagonal jumps:
  * consecutive keys can be far apart in (x, y), so a file of
  * consecutive z keys covers a box plus stragglers, inflating its
  * min/max envelope. The Hilbert curve (Hilbert 1891; Warren,
  * Hacker's Delight §16) is continuous — consecutive indexes are
  * always grid neighbors — so equal-size key ranges tile the plane in
  * tighter blobs and per-file column envelopes shrink, which is the
  * whole game for footer-stats skipping (measured against Z-order and
  * a linear sort in LAYOUT_r10.json via graft.LayoutProbe).
  *
  * The classic per-bit rotate-and-accumulate (xy2d) runs as one fused
  * 16-round integer loop in whole-stage codegen; interpreted eval
  * mirrors it exactly. Inputs are validated LONGs in [0, 65535]
  * (bucketization is the caller's job, as with zorder32); out-of-range
  * input raises rather than silently folding, since a wrong bucket
  * width would corrupt the layout invisibly.
  */
case class HilbertIndex32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert32 requires (BIGINT, BIGINT) bucket ids, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(xAny: Any, yAny: Any): Any =
    HilbertIndex32.xy2d(xAny.asInstanceOf[Long], yAny.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xIn, yIn) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      val d = ctx.freshName("hd")
      s"""
         |long $x = $xIn;
         |long $y = $yIn;
         |if ($x < 0L || $x > 65535L || $y < 0L || $y > 65535L) {
         |  throw new IllegalArgumentException(
         |    "hilbert32: bucket ids must be in [0, 65535], got (" + $x + ", " + $y + ")");
         |}
         |long $d = 0L;
         |for (long $s = 32768L; $s > 0L; $s >>= 1) {
         |  long $rx = ($x & $s) > 0L ? 1L : 0L;
         |  long $ry = ($y & $s) > 0L ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert32"
}

object HilbertIndex32 {

  /** Reference implementation (also the interpreted eval): standard
    * xy2d with per-level quadrant rotation. */
  def xy2d(x0: Long, y0: Long): Long = {
    require(x0 >= 0L && x0 <= 65535L && y0 >= 0L && y0 <= 65535L,
      s"hilbert32: bucket ids must be in [0, 65535], got ($x0, $y0)")
    var x = x0; var y = y0
    var d = 0L
    var s = 32768L
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse (test oracle only): index → (x, y). */
  def d2xy(d0: Long): (Long, Long) = {
    var rx = 0L; var ry = 0L
    var x = 0L; var y = 0L
    var t = d0
    var s = 1L
    while (s < 65536L) {
      rx = 1L & (t / 2L)
      ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4L
      s *= 2L
    }
    (x, y)
  }

  /** Column-API entry point over two BIGINT bucket-id columns. */
  def hilbert32(x: Column, y: Column): Column =
    ExpressionUtils.column(HilbertIndex32(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))
}
