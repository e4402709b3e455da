package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-word shingles of a word array as ONE native expression —
  * the other hot row-local kernel of the text-dedup family (every
  * MinHash/Jaccard operator shingles first; at sf0.1 the corpus is
  * ~260k shingles).
  *
  * Bit-identical to the portable HOF form (operators/Dedup.shingles:
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * slice(words, i+1, k))))` — what the DuckDB oracle mirrors;
  * equality is spec-tested, including first-occurrence distinct
  * order). Why native: the HOF form runs interpreted and allocates a
  * sliced array + joined string per position, then a distinct pass;
  * this is one walk over the word array with a reused LinkedHashSet.
  * CodegenFallback costs one virtual call per row, irrelevant next to
  * the per-shingle string building.
  *
  * Null semantics match: NULL word array → EMPTY array (the HOF
  * form's `when(size(words) >= k, ...)` has a NULL condition for NULL
  * input — size(NULL) is NULL — so its `otherwise` branch yields the
  * empty array; spec-tested bit-equal). NULL words are skipped inside
  * a shingle (concat_ws semantics); fewer than k words → empty array.
  */
case class WordShingles(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(k > 0, s"word_shingles needs k > 0, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  // SQL-registered (`word_shingles`), so arbitrary types can reach it:
  // fail at analysis, not with a ClassCastException mid-job. (Same
  // pattern as DotF32 — ExpectsInputTypes needs private[sql] types.)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles requires ARRAY<STRING>, got ${t.simpleString}")
    }

  private val sep = UTF8String.fromString(" ")

  // eval, not nullSafeEval: NULL input maps to the empty array.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val words = v.asInstanceOf[ArrayData]
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = words.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*)) // skips NULL words
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  // (CodegenFallback's generated call sites handle a null-returning
  // eval; ours never returns null, so nullable=false stays sound.)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  /** Distinct k-word shingles of `text` split on single spaces —
    * drop-in native replacement for operators/Dedup.shingles. */
  def shingles(text: Column, k: Int): Column =
    ExpressionUtils.column(WordShingles(
      ExpressionUtils.expression(org.apache.spark.sql.functions.split(text, " ")), k))
}
