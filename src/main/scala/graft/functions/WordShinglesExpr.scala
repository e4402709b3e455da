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
  * Null semantics match: NULL word array → NULL; NULL words are
  * skipped inside a shingle (concat_ws semantics); fewer than k words
  * → empty array.
  */
case class WordShingles(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(k > 0, s"word_shingles needs k > 0, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
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
