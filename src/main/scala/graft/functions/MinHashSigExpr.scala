package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The full k-slot MinHash signature of a shingle array as ONE native
  * expression — the hot row-local kernel of `dedup_minhash_lsh` (and
  * `pipeline_curate`, which runs it inside the component closure).
  *
  * Bit-identical to the portable SQL form (operators/Dedup.minhashSig:
  * per seed s, the lexicographic min over shingles of the first 8 hex
  * chars of md5("s:" + shingle) — which the DuckDB oracle mirrors;
  * equality is spec-tested). Why native: the SQL form is k=16
  * higher-order `array_min(transform(...))` lambdas per row, and
  * lambda functions are INTERPRETED — every shingle costs 16
  * interpreted closure calls, 16 UTF8 concats, 16 hex substrings, and
  * 16 transient arrays. This expression makes one pass over the
  * shingles with a reused MessageDigest, tracks each slot's minimum
  * as an unsigned 32-bit int (first-4-bytes numeric min ≡ 8-hex-char
  * lexicographic min), and formats hex once at the end — no
  * intermediate allocation at all. CodegenFallback costs one virtual
  * call per row, irrelevant next to the k·|shingles| hashing loop.
  *
  * Null semantics match the HOF form: NULL, empty, or all-NULL
  * shingle arrays all yield a signature of k NULL slots (the HOF's
  * `array_min(transform(NULL, ...))` is NULL per seed, so the outer
  * `array(...)` is k NULLs — never a NULL signature); band keys over
  * such a signature concat to NULL and never join. NULL elements are
  * skipped (array_min semantics).
  */
case class MinHashSig(child: Expression, nHashes: Int)
  extends UnaryExpression with CodegenFallback {

  require(nHashes > 0, s"minhash_sig needs nHashes > 0, got $nHashes")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false

  // SQL-registered (`minhash_sig`): reject wrong-typed input at
  // analysis rather than ClassCastException at execution (DotF32
  // pattern; ExpectsInputTypes needs private[sql] types).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires ARRAY<STRING>, got ${t.simpleString}")
    }

  @transient private lazy val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(nHashes)(s => s"$s:".getBytes("UTF-8"))

  // eval, not nullSafeEval: NULL input yields the k-NULL-slot
  // signature, same as the HOF form.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null)
      return new GenericArrayData(Array.fill[Any](nHashes)(null))
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(nHashes)(-1L) // -1 = no non-null shingle seen
    val d = md5.get()
    var i = 0
    while (i < n) {
      val sh = arr.getUTF8String(i)
      if (sh != null) {
        val shB = sh.getBytes
        var s = 0
        while (s < nHashes) {
          d.reset()
          d.update(seedPrefixes(s))
          d.update(shB)
          val h = d.digest()
          // first 8 hex chars = first 4 bytes as unsigned int
          val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
            ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
          if (mins(s) == -1L || v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m == -1L) null else UTF8String.fromString(f"$m%08x")): Array[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  def minhashSig(shingles: Column, nHashes: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(shingles), nHashes))
}
