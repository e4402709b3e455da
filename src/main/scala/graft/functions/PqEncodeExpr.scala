package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Product-quantization encode as ONE native expression:
  * `pq_encode(residual)` returns the `pm` sub-codebook indices (one
  * tinyint per subspace) of a residual vector against a
  * driver-trained flat codebook (Jégou et al. 2011; see
  * `Similarity.pqCodebook`).
  *
  * Why an expression and not the HOF pipeline: the portable form
  * (`transform` over subspaces of `array_position(dists,
  * array_min(dists))` with the distance list built twice by nested
  * `aggregate`s over an inlined 1024-double literal) is value-equal —
  * `PqSpec`/`FunctionsSpec` assert bit-equality — but evaluates
  * pm·pk·(2·psub) interpreted lambdas per row and ships the codebook
  * as a kilobyte-scale expression literal duplicated per distance
  * term. Here the codebook rides along as ONE reference object (the
  * task-binary analog of a broadcast, the `NearestCentroid` pattern)
  * and encoding is a fused primitive triple loop. CodegenFallback
  * costs one virtual call per row, irrelevant next to the
  * pm·pk·psub-flop loop (the `MinHashSig`/`QuantizeI8` trade-off).
  *
  * Semantics (mirrored exactly by the DuckDB oracle and the HOF
  * form): per subspace m, squared-L2 distance to each of the pk
  * codewords accumulated left-to-right over the psub dims, argmin
  * with ties to the FIRST index (strict `<` ≙ `array_position` of
  * the min). NULL vector, NULL element, or a length mismatch → NULL
  * (the kernel null discipline; the operators feed non-null
  * residuals, so the HOF null shapes never arise).
  */
case class PqEncode(child: Expression, cb: Array[Double],
    pm: Int, pk: Int, psub: Int)
  extends UnaryExpression with CodegenFallback {

  require(cb.length == pm * pk * psub,
    s"pq_encode codebook must be pm*pk*psub = ${pm * pk * psub} doubles, got ${cb.length}")

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires ARRAY<DOUBLE> (the residual), got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != pm * psub) return null
    val out = new Array[Byte](pm)
    var m = 0
    while (m < pm) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < pk) {
        val base = (m * pk + j) * psub
        var dd = 0.0
        var i = 0
        while (i < psub) {
          val idx = m * psub + i
          if (v.isNullAt(idx)) return null
          val df = v.getDouble(idx) - cb(base + i)
          dd += df * df
          i += 1
        }
        if (dd < bestD) { bestD = dd; best = j } // first index on ties
        j += 1
      }
      out(m) = best.toByte
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

object PqEncode {
  def encode(residual: Column, cb: Array[Double],
      pm: Int, pk: Int, psub: Int): Column =
    ExpressionUtils.column(PqEncode(
      ExpressionUtils.expression(residual), cb, pm, pk, psub))
}
