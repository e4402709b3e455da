package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document 2-gram repetition statistics as ONE native pass:
  * `gram_stats(words) = STRUCT(n_grams: INT, n_uniq_grams: INT,
  * max_gram_n: INT)` over the word array's adjacent pairs — the
  * row-local kernel of the Gopher-style repetition filter
  * (`TextAnalysis.textRepetition`).
  *
  * Value-identical to the composed HOF form
  *
  *   grams = transform(sequence(0, size(words)-2),
  *                     i -> concat_ws(" ", slice(words, i+1, 2)))
  *   (size(grams), size(array_distinct(grams)),
  *    array_max(transform(array_distinct(grams),
  *              g -> size(filter(grams, x -> x = g)))))
  *
  * (what the DuckDB oracle mirrors; spec-tested) — but one walk with
  * a reused count map instead of interpreted O(L²) nested-lambda
  * evaluation: for each distinct gram, the HOF form re-filters the
  * whole gram list. CodegenFallback costs one virtual call per row,
  * irrelevant next to the per-gram hashing.
  *
  * Null semantics: NULL word array → NULL; NULL words inside a gram
  * follow concat_ws (skipped). Fewer than 2 words → n_grams = 0 and
  * the other stats 0 (callers filter such rows; the HOF form's
  * array_max over an empty list would be NULL — spec covers the
  * difference is unobservable behind the ≥2-word filter).
  */
case class GramStats(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = GramStats.outType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_stats requires ARRAY<STRING>, got ${t.simpleString}")
    }

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[ArrayData]
    val n = words.numElements()
    if (n < 2) return InternalRow(0, 0, 0)
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var maxN = 0
    var i = 0
    while (i < n - 1) {
      // concat_ws semantics: null elements skipped
      val a = if (words.isNullAt(i)) null else words.getUTF8String(i)
      val b = if (words.isNullAt(i + 1)) null else words.getUTF8String(i + 1)
      val gram =
        if (a == null && b == null) UTF8String.EMPTY_UTF8
        else if (a == null) b
        else if (b == null) a
        else UTF8String.concatWs(sep, a, b)
      val c = counts.merge(gram, 1, (x, y) => x + y)
      if (c > maxN) maxN = c
      i += 1
    }
    InternalRow(n - 1, counts.size(), maxN)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "gram_stats"
}

object GramStats {
  val outType: StructType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_uniq_grams", IntegerType, nullable = false),
    StructField("max_gram_n", IntegerType, nullable = false)))

  /** Column-API entry point over an ARRAY<STRING> word column. */
  def gramStats(words: Column): Column =
    ExpressionUtils.column(GramStats(ExpressionUtils.expression(words)))
}
