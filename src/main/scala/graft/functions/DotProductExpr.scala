package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Native Catalyst expression for the float32-embedding dot product —
  * the hot inner loop of every similarity/embedding-dedup operator
  * (`Similarity.dot` call sites: sim_topk, sim_ann_lsh, sim_ivf,
  * dedup_embed_cosine).
  *
  * Semantically identical to the portable higher-order-function form
  *
  *   aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)),
  *             0.0d, (acc,v) -> acc + v)
  *
  * — same strict left-to-right double accumulation (deterministic,
  * engine-portable; DedupSpec/SimilaritySpec assert bit-equality) —
  * but compiled into whole-stage codegen: one fused primitive loop
  * per row instead of Spark's INTERPRETED lambda evaluation, which
  * allocates a zipped intermediate array and evaluates two closures
  * per element. At 100 TB the scoring scan is the dominant stage of
  * every ANN query; this keeps it inside generated code.
  *
  * Null semantics match the HOF form exactly: NULL if either array is
  * NULL, if lengths differ (zip_with pads with NULL), or if any
  * element is NULL (NULL poisons the fold).
  */
case class DotF32(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // Registered as SQL `dot_f32`, so arbitrary types can reach it:
  // without this check, ARRAY<DOUBLE> input silently returns garbage
  // via getFloat on the UnsafeArrayData path. (ExpectsInputTypes is
  // unavailable — AbstractDataType is private[sql] — so validate
  // explicitly; no implicit casts, a clean analysis error instead.)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isFloatArray(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_f32 requires (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
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
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc") // freshName: two DotF32 in one stage must not collide
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f32"
}

object DotF32 {
  /** Untyped NULL literals (`dot_f32(NULL, v)`) get the implicit cast
    * Spark built-ins enjoy: NullType -> ARRAY<FLOAT>, so the call
    * analyzes and evaluates to NULL instead of failing the type check
    * (the strict check still rejects every other wrong type). */
  private[functions] def normNull(e: Expression): Expression =
    if (e.resolved && e.dataType == NullType)
      Cast(e, ArrayType(FloatType))
    else e

  /** Column-API entry point over two ARRAY<FLOAT> columns. */
  def dotF32(a: Column, b: Column): Column =
    ExpressionUtils.column(DotF32(
      normNull(ExpressionUtils.expression(a)),
      normNull(ExpressionUtils.expression(b))))
}
