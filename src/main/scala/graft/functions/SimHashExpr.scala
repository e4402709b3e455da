package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash of a token array as a native Catalyst expression.
  *
  * Semantics are bit-identical to the portable SQL form
  * (operators/Dedup.simhashOverHexes, which the DuckDB oracle
  * mirrors): token hash = first 8 hex chars of md5(token); SimHash
  * bit j is the majority vote of bit (j%4) of hex digit (j/4) across
  * tokens, ties voting 1.
  *
  * Why native: the SQL form needs 32 higher-order `aggregate` lambdas
  * per row, and lambda functions are interpreted (no codegen) —
  * ~10 s at sf0.1. This expression hashes each token once and
  * accumulates all 32 votes in one JVM loop (~100× fewer virtual
  * calls); CodegenFallback costs one call per row, irrelevant next to
  * the hashing itself.
  */
case class SimHash32(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  @transient private lazy val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](32)
    val d = md5.get()
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok != null) {
        d.reset()
        val h = d.digest(tok.getBytes)
        // bits come from the first 8 hex digits = first 4 bytes;
        // digit (j/4): even -> high nibble, odd -> low nibble
        var j = 0
        while (j < 32) {
          val nib = j / 4
          val digit =
            if ((nib & 1) == 0) (h(nib / 2) >> 4) & 0xf
            else h(nib / 2) & 0xf
          votes(j) += (digit >> (j % 4)) & 1
          j += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 32) {
      if (2 * votes(j) >= n) sim |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sim)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash32"
}

object SimHash32 {
  def simhash32(tokens: Column): Column =
    ExpressionUtils.column(SimHash32(ExpressionUtils.expression(tokens)))
}
