package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Positional k-word gram hashes (16-hex md5 prefix) WITH
  * multiplicity, as ONE native expression — the term stream of the
  * BM25 retrieval family, where tf matters so `WordShingles`' distinct
  * set cannot be used.
  *
  * Bit-identical to the portable HOF form (what the DuckDB oracle
  * mirrors): `transform(sequence(0, n-k), i -> substring(md5(
  * concat_ws(" ", slice(words, i+1, k))), 1, 16))` — spec-tested
  * equal element-for-element. Why native: the HOF form runs
  * interpreted and allocates a sliced array, a joined string, a hex
  * digest string, and a substring per POSITION (the BM25 postings
  * build at sf0.1 spent ~4 s here, 10× the rest of the query); this
  * is one walk over the word array with a thread-local MessageDigest
  * and direct 8-byte→16-hex encoding.
  *
  * Null semantics match the HOF form: NULL word array → empty array
  * (`when(size(words) >= k, ...)`'s NULL condition selects the
  * `otherwise` empty-array branch); fewer than k words → empty array;
  * NULL words are skipped inside a gram (concat_ws semantics).
  */
case class PosGramHashes(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(k > 0, s"pos_gram_hashes needs k > 0, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pos_gram_hashes requires ARRAY<STRING>, got ${t.simpleString}")
    }

  private val sep = UTF8String.fromString(" ")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val words = v.asInstanceOf[ArrayData]
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val md = PosGramHashes.digest.get()
    val out = new Array[AnyRef](n - k + 1)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) {
        // null elements must reach concatWs AS null (it skips them —
        // the documented HOF/concat_ws semantics); UnsafeArrayData's
        // getUTF8String would silently decode a null slot as ""
        parts(j) =
          if (words.isNullAt(i + j)) null else words.getUTF8String(i + j)
        j += 1
      }
      md.reset()
      md.update(UTF8String.concatWs(sep, parts: _*).getBytes)
      out(i) = PosGramHashes.hex16(md.digest())
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pos_gram_hashes"
}

object PosGramHashes {
  private[functions] val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".getBytes

  /** First 8 digest bytes as 16 lowercase hex chars — exactly
    * `substring(md5(x), 1, 16)`. */
  private[functions] def hex16(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Positional k-word gram md5-16 hashes of `text` split on single
    * spaces — drop-in native replacement for the HOF gram stream. */
  def posGramHashes(text: Column, k: Int): Column =
    ExpressionUtils.column(PosGramHashes(
      ExpressionUtils.expression(org.apache.spark.sql.functions.split(text, " ")), k))
}
