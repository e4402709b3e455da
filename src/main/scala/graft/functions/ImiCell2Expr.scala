package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Beam-2 two-level quantizer assignment as ONE native codegen'd
  * expression: `imi_cell2(vec)` ranks the S ≈ √k super-centroids,
  * keeps the TOP-2, and returns the argmax-cosine centroid among the
  * union of both supers' children — the multi-sequence refinement of
  * the inverted multi-index (Babenko & Lempitsky, CVPR 2012): a
  * vector whose true cell hangs under the runner-up super is no
  * longer mis-assigned (measured on the planted clustered corpus:
  * recall@10 0.83 → ~0.95 at the same serve cost, since assignment
  * quality moves the INDEX, not the probe).
  *
  * Cost is O(S·d + 2·(k/S)·d) ≈ O(3√k·d) per row — still ~25× under
  * flat O(k·d) at sf5's k, and the whole thing stays a NARROW
  * per-row projection over the scan (the [[NearestCentroid]]
  * reference-object pattern): zero shuffle, zero corpus inflation,
  * constant generated-code size in k and S.
  *
  * Semantics, mirrored exactly by the DuckDB oracle (supers ranked by
  * `round(dot,4) DESC, sid ASC`, then one windowed argmax
  * `round(dot,4) DESC, cent_id ASC` over the children of the
  * vector's top-2 supers): strict left-to-right float→double dots,
  * HALF_UP round to 4 decimals, GLOBAL smallest-id tie-break across
  * the union (not per-group). NULL vector/element, a length
  * mismatch, or an empty candidate union → NULL.
  */
case class ImiCell2(child: Expression,
    superVecs: Array[Array[Float]],
    ids: Array[Array[Long]], cents: Array[Array[Array[Float]]])
  extends UnaryExpression {

  require(superVecs.nonEmpty && superVecs.length == ids.length &&
    ids.length == cents.length,
    s"imi_cell2 needs aligned supers/groups (S=${superVecs.length}, ids=${ids.length}, cents=${cents.length})")
  require(ids.indices.forall(g => ids(g).length == cents(g).length),
    "per-group ids and centroid arrays must align")
  require(ids.forall(g => g.sliding(2).forall(w => w.length < 2 || w(0) < w(1))),
    "centroid ids must be strictly ascending within each group")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"imi_cell2 requires ARRAY<FLOAT>, got ${other.simpleString}")
    }

  private def round4(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    // level 1: top-2 supers by (round4 dot desc, sid asc) — sids are
    // positional 0..S-1, ascending iteration + strict '>' = tie to
    // the smaller sid; the runner-up inherits the same rule
    var b1 = 0.0; var s1 = -1; var b2 = 0.0; var s2 = -1
    var s = 0
    while (s < superVecs.length) {
      val sv = superVecs(s)
      if (sv.length != n) return null
      var acc = 0.0; var j = 0
      while (j < n) {
        if (v.isNullAt(j)) return null
        acc += v.getFloat(j).toDouble * sv(j).toDouble
        j += 1
      }
      val r = round4(acc)
      if (s1 < 0 || r > b1) { b2 = b1; s2 = s1; b1 = r; s1 = s }
      else if (s2 < 0 || r > b2) { b2 = r; s2 = s }
      s += 1
    }
    // level 2: global argmax over the union of both groups' children
    var best = 0.0; var bestId = 0L; var first = true
    var gi = 0
    while (gi < 2) {
      val g = if (gi == 0) s1 else s2
      if (g >= 0) {
        val gIds = ids(g); val gCents = cents(g)
        var c = 0
        while (c < gCents.length) {
          val cv = gCents(c)
          if (cv.length != n) return null
          var acc = 0.0; var j = 0
          while (j < n) {
            acc += v.getFloat(j).toDouble * cv(j).toDouble
            j += 1
          }
          val r = round4(acc)
          if (first || r > best || (r == best && gIds(c) < bestId)) {
            best = r; bestId = gIds(c); first = false
          }
          c += 1
        }
      }
      gi += 1
    }
    if (first) null else java.lang.Long.valueOf(bestId)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val supersRef = ctx.addReferenceObj("imiSupers", superVecs, "float[][]")
    val idsRef = ctx.addReferenceObj("imiIds", ids, "long[][]")
    val centsRef = ctx.addReferenceObj("imiCents", cents, "float[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val b1 = ctx.freshName("b1"); val s1 = ctx.freshName("s1")
      val b2 = ctx.freshName("b2"); val s2 = ctx.freshName("s2")
      val s = ctx.freshName("s"); val sv = ctx.freshName("sv")
      val gi = ctx.freshName("gi"); val g = ctx.freshName("g")
      val gIds = ctx.freshName("gIds"); val gCents = ctx.freshName("gCents")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val cv = ctx.freshName("cv"); val acc = ctx.freshName("acc")
      val r = ctx.freshName("r")
      val best = ctx.freshName("best"); val bestId = ctx.freshName("bestId")
      val first = ctx.freshName("first")
      val outer = ctx.freshName("outer")
      s"""
         |final int $n = $v.numElements();
         |double $b1 = 0.0; int $s1 = -1; double $b2 = 0.0; int $s2 = -1;
         |$outer:
         |for (int $s = 0; $s < $supersRef.length; $s++) {
         |  final float[] $sv = $supersRef[$s];
         |  if ($sv.length != $n) { ${ev.isNull} = true; break; }
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($v.isNullAt($j)) { ${ev.isNull} = true; break $outer; }
         |    $acc += ((double) $v.getFloat($j)) * ((double) $sv[$j]);
         |  }
         |  final double $r = java.math.BigDecimal.valueOf($acc)
         |    .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue();
         |  if ($s1 < 0 || $r > $b1) { $b2 = $b1; $s2 = $s1; $b1 = $r; $s1 = $s; }
         |  else if ($s2 < 0 || $r > $b2) { $b2 = $r; $s2 = $s; }
         |}
         |double $best = 0.0; long $bestId = 0L; boolean $first = true;
         |if (!${ev.isNull}) {
         |  for (int $gi = 0; $gi < 2 && !${ev.isNull}; $gi++) {
         |    final int $g = ($gi == 0) ? $s1 : $s2;
         |    if ($g >= 0) {
         |      final long[] $gIds = $idsRef[$g];
         |      final float[][] $gCents = $centsRef[$g];
         |      for (int $c = 0; $c < $gCents.length; $c++) {
         |        final float[] $cv = $gCents[$c];
         |        if ($cv.length != $n) { ${ev.isNull} = true; break; }
         |        double $acc = 0.0;
         |        for (int $j = 0; $j < $n; $j++) {
         |          $acc += ((double) $v.getFloat($j)) * ((double) $cv[$j]);
         |        }
         |        final double $r = java.math.BigDecimal.valueOf($acc)
         |          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue();
         |        if ($first || $r > $best || ($r == $best && $gIds[$c] < $bestId)) {
         |          $best = $r; $bestId = $gIds[$c]; $first = false;
         |        }
         |      }
         |    }
         |  }
         |  if ($first) ${ev.isNull} = true;
         |  if (!${ev.isNull}) ${ev.value} = $bestId;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "imi_cell2"
}

object ImiCell2 {
  /** Beam-2 IMI cell id of `vec` from the driver-built two-level
    * index: `supers` positional (sid 0..S-1), `groups` indexed by sid
    * (children sorted by id within each group). */
  def cell(vec: Column, supers: Array[(Long, Array[Float])],
      groups: Array[Array[(Long, Array[Float])]]): Column = {
    val sortedSupers = supers.sortBy(_._1)
    require(sortedSupers.zipWithIndex.forall { case ((sid, _), i) => sid == i },
      "supers must be positional 0..S-1")
    val sorted = groups.map(_.sortBy(_._1))
    ExpressionUtils.column(ImiCell2(
      ExpressionUtils.expression(vec), sortedSupers.map(_._2),
      sorted.map(_.map(_._1)), sorted.map(_.map(_._2))))
  }
}
