package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** TOP-2 beam-2 IMI cells of a vector as ONE native codegen'd
  * expression: `imi_cells_top2(vec)` runs the exact traversal of
  * [[ImiCell2]] (top-2 supers by `(round4 dot DESC, sid ASC)`, then
  * rank the union of both supers' children by `(round4 dot DESC,
  * cent_id ASC)`) but keeps the TWO best children instead of the
  * argmax — element 0 is always the [[ImiCell2]] cell, element 1 the
  * runner-up (absent when the union has a single child).
  *
  * This is the corpus side of MULTI-ASSIGNMENT IVF (Jégou et al.,
  * "Searching with quantization", INRIA RR-7020 §5: assign each
  * database vector to its r nearest cells): a corpus row near a cell
  * boundary is indexed under BOTH plausible cells, so a query probing
  * only its own top cell still finds it. Recall rises at a fixed
  * QUERY probe count in exchange for a 2× index footprint — the
  * trade a serving layer wants when probes are the scarce resource
  * (each probe is a bucket read of the persisted layout).
  *
  * Cost and shape are unchanged from [[ImiCell2]]: O(3√k·d) per row,
  * a NARROW per-row projection (zero shuffle, constant generated-code
  * size); the 2× inflation happens only in the downstream explode.
  * Oracle mirror: the same windowed argmax CTE as `imi_cell2` with
  * `arnk <= 2` instead of `= 1`. NULL vector/element, a length
  * mismatch, or an empty candidate union → NULL.
  */
case class ImiCellsTop2(child: Expression,
    superVecs: Array[Array[Float]],
    ids: Array[Array[Long]], cents: Array[Array[Array[Float]]])
  extends UnaryExpression {

  require(superVecs.nonEmpty && superVecs.length == ids.length &&
    ids.length == cents.length,
    s"imi_cells_top2 needs aligned supers/groups (S=${superVecs.length}, ids=${ids.length}, cents=${cents.length})")
  require(ids.indices.forall(g => ids(g).length == cents(g).length),
    "per-group ids and centroid arrays must align")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"imi_cells_top2 requires ARRAY<FLOAT>, got ${other.simpleString}")
    }

  private def round4(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
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
    // rank the union of both groups' children, keep the two best under
    // the global (round4 desc, id asc) order — c1 is ImiCell2's argmax
    var r1 = 0.0; var id1 = 0L; var has1 = false
    var r2 = 0.0; var id2 = 0L; var has2 = false
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
          val cid = gIds(c)
          if (!has1 || r > r1 || (r == r1 && cid < id1)) {
            r2 = r1; id2 = id1; has2 = has1
            r1 = r; id1 = cid; has1 = true
          } else if (!has2 || r > r2 || (r == r2 && cid < id2)) {
            r2 = r; id2 = cid; has2 = true
          }
          c += 1
        }
      }
      gi += 1
    }
    if (!has1) null
    else if (!has2) new GenericArrayData(Array(id1))
    else new GenericArrayData(Array(id1, id2))
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
      val r = ctx.freshName("r"); val cid = ctx.freshName("cid")
      val r1 = ctx.freshName("r1"); val id1 = ctx.freshName("id1")
      val has1 = ctx.freshName("has1")
      val r2 = ctx.freshName("r2"); val id2 = ctx.freshName("id2")
      val has2 = ctx.freshName("has2")
      val outer = ctx.freshName("outer")
      val tmp = ctx.freshName("tmp")
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
         |double $r1 = 0.0; long $id1 = 0L; boolean $has1 = false;
         |double $r2 = 0.0; long $id2 = 0L; boolean $has2 = false;
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
         |        final long $cid = $gIds[$c];
         |        if (!$has1 || $r > $r1 || ($r == $r1 && $cid < $id1)) {
         |          $r2 = $r1; $id2 = $id1; $has2 = $has1;
         |          $r1 = $r; $id1 = $cid; $has1 = true;
         |        } else if (!$has2 || $r > $r2 || ($r == $r2 && $cid < $id2)) {
         |          $r2 = $r; $id2 = $cid; $has2 = true;
         |        }
         |      }
         |    }
         |  }
         |  if (!$has1) ${ev.isNull} = true;
         |  if (!${ev.isNull}) {
         |    final long[] $tmp = $has2 ? new long[]{$id1, $id2} : new long[]{$id1};
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "imi_cells_top2"
}

object ImiCellsTop2 {
  /** Top-2 beam-2 IMI cell ids of `vec` (element 0 = the [[ImiCell2]]
    * assignment) from the driver-built two-level index. */
  def cells(vec: Column, supers: Array[(Long, Array[Float])],
      groups: Array[Array[(Long, Array[Float])]]): Column = {
    val sortedSupers = supers.sortBy(_._1)
    require(sortedSupers.zipWithIndex.forall { case ((sid, _), i) => sid == i },
      "supers must be positional 0..S-1")
    val sorted = groups.map(_.sortBy(_._1))
    ExpressionUtils.column(ImiCellsTop2(
      ExpressionUtils.expression(vec), sortedSupers.map(_._2),
      sorted.map(_.map(_._1)), sorted.map(_.map(_._2))))
  }
}
