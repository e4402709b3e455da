package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Second level of the two-level coarse quantizer (the inverted
  * multi-index idea — Babenko & Lempitsky, CVPR 2012, applied here as
  * super-cell → child-cell): `nearest_centroid_in(vec, sid)` returns
  * the id of the max-cosine centroid among the CHILDREN of super-cell
  * `sid` only. With S ≈ √k supers, assignment costs
  * O(S·d) + O((k/S)·d) ≈ O(2√k·d) per row instead of the flat
  * O(k·d) — the term that made flat-IVF assignment O(n·√n·d) overall
  * once k grows with the corpus (k = n/TargetCellSize).
  *
  * Same design as [[NearestCentroid]]: the grouped centroid table
  * rides into the generated code as a reference object, so the
  * assignment stays a NARROW per-row projection — zero shuffle, zero
  * corpus inflation (the join-based alternative would inflate the
  * corpus ×(k/S) through a broadcast join and shuffle it back through
  * an argmax aggregation). The generated loop is data-driven over
  * primitive arrays: code size is constant in k and S.
  *
  * Semantics per child set: strict left-to-right float→double dot,
  * rounded HALF_UP to 4 decimals, argmax with ties to the smallest
  * centroid id — identical to the flat expression and mirrored by the
  * DuckDB oracle's windowed argmax restricted to the parent map.
  * NULL vector/element, NULL or out-of-range group id, a length
  * mismatch, or an empty child set → NULL.
  */
case class NearestCentroidInGroup(left: Expression, right: Expression,
    ids: Array[Array[Long]], cents: Array[Array[Array[Float]]])
  extends BinaryExpression {

  require(ids.length == cents.length && ids.nonEmpty,
    s"nearest_centroid_in needs a non-empty group table (ids=${ids.length}, cents=${cents.length})")
  require(ids.indices.forall(g => ids(g).length == cents(g).length),
    "per-group ids and centroid arrays must align")
  // ascending-id iteration + strict '>' = ties break to smallest id
  require(ids.forall(g => g.sliding(2).forall(w => w.length < 2 || w(0) < w(1))),
    "centroid ids must be strictly ascending within each group")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid_in requires (ARRAY<FLOAT>, BIGINT), got (${l.simpleString}, ${r.simpleString})")
    }

  private def round4(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(vecIn: Any, groupIn: Any): Any = {
    val g = groupIn.asInstanceOf[Long]
    if (g < 0 || g >= ids.length) return null
    val gIds = ids(g.toInt)
    val gCents = cents(g.toInt)
    if (gIds.isEmpty) return null
    val v = vecIn.asInstanceOf[ArrayData]
    val n = v.numElements()
    var best = 0.0
    var bestId = 0L
    var first = true
    var c = 0
    while (c < gCents.length) {
      val cv = gCents(c)
      if (cv.length != n) return null
      var acc = 0.0
      var j = 0
      while (j < n) {
        if (v.isNullAt(j)) return null
        acc += v.getFloat(j).toDouble * cv(j).toDouble
        j += 1
      }
      val r = round4(acc)
      if (first || r > best) { best = r; bestId = gIds(c); first = false }
      c += 1
    }
    java.lang.Long.valueOf(bestId)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ncgIds", ids, "long[][]")
    val centsRef = ctx.addReferenceObj("ncgCents", cents, "float[][][]")
    nullSafeCodeGen(ctx, ev, (v, g) => {
      val n = ctx.freshName("n")
      val gi = ctx.freshName("gi")
      val gIds = ctx.freshName("gIds")
      val gCents = ctx.freshName("gCents")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val cv = ctx.freshName("cv")
      val acc = ctx.freshName("acc")
      val r = ctx.freshName("r")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      val first = ctx.freshName("first")
      val outer = ctx.freshName("outer")
      s"""
         |if ($g < 0L || $g >= ${idsRef}.length) { ${ev.isNull} = true; }
         |else {
         |  final int $gi = (int) $g;
         |  final long[] $gIds = $idsRef[$gi];
         |  final float[][] $gCents = $centsRef[$gi];
         |  if ($gIds.length == 0) { ${ev.isNull} = true; }
         |  else {
         |    final int $n = $v.numElements();
         |    double $best = 0.0; long $bestId = 0L; boolean $first = true;
         |    $outer:
         |    for (int $c = 0; $c < $gCents.length; $c++) {
         |      final float[] $cv = $gCents[$c];
         |      if ($cv.length != $n) { ${ev.isNull} = true; break; }
         |      double $acc = 0.0;
         |      for (int $j = 0; $j < $n; $j++) {
         |        if ($v.isNullAt($j)) { ${ev.isNull} = true; break $outer; }
         |        $acc += ((double) $v.getFloat($j)) * ((double) $cv[$j]);
         |      }
         |      final double $r = java.math.BigDecimal.valueOf($acc)
         |        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue();
         |      if ($first || $r > $best) { $best = $r; $bestId = $gIds[$c]; $first = false; }
         |    }
         |    if (!${ev.isNull}) ${ev.value} = $bestId;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "nearest_centroid_in"
}

object NearestCentroidInGroup {
  /** Cell id of `vec` among the children of super-cell `sid`, from a
    * driver-built grouped centroid table (groups indexed by sid;
    * children sorted by id within each group). */
  def nearestIn(vec: Column, sid: Column,
      groups: Array[Array[(Long, Array[Float])]]): Column = {
    val sorted = groups.map(_.sortBy(_._1))
    ExpressionUtils.column(NearestCentroidInGroup(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(sid),
      sorted.map(_.map(_._1)), sorted.map(_.map(_._2))))
  }
}
