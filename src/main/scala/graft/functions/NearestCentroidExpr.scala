package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Coarse-quantizer cell assignment as ONE native codegen'd
  * expression: `nearest_centroid(vec)` returns the id of the
  * max-cosine centroid from a driver-collected centroid set (IVF /
  * SemDeDup assignment — Jégou 2011, Abbas et al. 2023).
  *
  * Why an expression and not a join: the centroid set is deterministic
  * and small (bounded by `Similarity.MaxCentroidK`), so shipping it
  * inside the expression (a codegen reference object — the
  * task-binary analog of a broadcast variable) makes assignment a
  * NARROW per-row projection over the scan: zero shuffle, zero
  * aggregation, zero corpus inflation — the same pattern as the
  * inlined LSH planes in `Similarity.simAnnLsh`. The previous form
  * (crossJoin(broadcast(centroids)) + groupBy + max_by) shuffled the
  * whole corpus one-row-per-vector just to run the argmax; at 100 TB
  * that shuffle IS the assignment cost.
  *
  * The generated loop is k×dim inside whole-stage codegen — a plain
  * nested for over primitive arrays, NOT k unrolled sub-expressions,
  * so generated-code size is constant in k (no 64 KB method blowup as
  * k grows with the corpus).
  *
  * Semantics (mirrored exactly by the DuckDB oracle's
  * `row_number() OVER (ORDER BY round(dot, 4) DESC, cent_id ASC)`):
  * per centroid, the strict left-to-right float→double dot product
  * (DotF32 semantics), rounded HALF_UP to 4 decimals — Spark's own
  * `round(x, 4)` — then argmax with ties to the smallest centroid id.
  * NULL vector, NULL element, or a length mismatch → NULL.
  */
case class NearestCentroid(child: Expression,
    ids: Array[Long], cents: Array[Array[Float]])
  extends UnaryExpression {

  require(ids.length == cents.length && ids.nonEmpty,
    s"nearest_centroid needs a non-empty centroid set (ids=${ids.length}, cents=${cents.length})")
  // ascending-id iteration + strict '>' = ties break to smallest id
  require(ids.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "centroid ids must be strictly ascending")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid requires ARRAY<FLOAT>, got ${other.simpleString}")
    }

  /** Spark `round(x, 4)` for doubles: BigDecimal.valueOf + HALF_UP. */
  private def round4(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var best = 0.0
    var bestId = 0L
    var first = true
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      if (cv.length != n) return null
      var acc = 0.0
      var j = 0
      while (j < n) {
        if (v.isNullAt(j)) return null
        acc += v.getFloat(j).toDouble * cv(j).toDouble
        j += 1
      }
      val r = round4(acc)
      if (first || r > best) { best = r; bestId = ids(c); first = false }
      c += 1
    }
    java.lang.Long.valueOf(bestId)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ncIds", ids, "long[]")
    val centsRef = ctx.addReferenceObj("ncCents", cents, "float[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
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
         |final int $n = $v.numElements();
         |double $best = 0.0; long $bestId = 0L; boolean $first = true;
         |$outer:
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  final float[] $cv = $centsRef[$c];
         |  if ($cv.length != $n) { ${ev.isNull} = true; break; }
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($v.isNullAt($j)) { ${ev.isNull} = true; break $outer; }
         |    $acc += ((double) $v.getFloat($j)) * ((double) $cv[$j]);
         |  }
         |  final double $r = java.math.BigDecimal.valueOf($acc)
         |    .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue();
         |  if ($first || $r > $best) { $best = $r; $bestId = $idsRef[$c]; $first = false; }
         |}
         |if (!${ev.isNull}) ${ev.value} = $bestId;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {
  /** Cell id of `vec` against a driver-collected centroid set
    * (sorted by id internally — callers pass collect() output as-is). */
  def nearest(vec: Column, cents: Array[(Long, Array[Float])]): Column = {
    val sorted = cents.sortBy(_._1)
    ExpressionUtils.column(NearestCentroid(
      ExpressionUtils.expression(vec), sorted.map(_._1), sorted.map(_._2)))
  }
}
