package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst probe for a pre-built Bloom filter — the runtime
  * row-level pruning primitive behind `BloomJoin.semiJoinBloom`.
  *
  * The filter bits arrive as a foldable BINARY literal (the serialized
  * `org.apache.spark.util.sketch.BloomFilter` that
  * `DataFrame.stat.bloomFilter` produced with a distributed
  * aggregation); the probe value is a BIGINT key. The deserialized
  * filter is built once per expression instance (`@transient lazy`) and
  * embedded into whole-stage codegen as a reference object, so the hot
  * path is a branch-free `mightContainLong` per row inside the fused
  * scan stage — no UDF, no per-row deserialization.
  *
  * This is the same plan shape Spark's own runtime bloom-filter join
  * pruning injects (`InjectRuntimeFilter`), expressed as a library
  * operator the caller controls: build on the small-but-not-broadcast
  * side, probe below the big side's Exchange, keep the exact join
  * after it (false positives are dropped there, so results are
  * EXACTLY the plain join's — the filter only cuts shuffle volume).
  *
  * Null semantics: NULL key → NULL (≡ false under a Filter, matching
  * the semi-join, which never matches a NULL key).
  */
case class BloomMightContain(filter: Expression, value: Expression)
    extends BinaryExpression {

  override def left: Expression = filter
  override def right: Expression = value

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = value.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (filter.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a BINARY filter, got ${filter.dataType.simpleString}")
    else if (!filter.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain requires the filter bits to be a literal " +
          "(build them first; they are data, not a per-row column)")
    else if (value.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a BIGINT key, got ${value.dataType.simpleString}")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  /** Deserialized once per expression instance; `BloomFilter` is
    * java-serializable, so the codegen reference object ships to
    * executors with the plan exactly like a broadcast-hash relation —
    * except it is ~10× smaller than a hash set of the same keys. */
  @transient private lazy val bloom: BloomFilter = {
    val bytes = filter.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_might_contain: filter bits are NULL")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = value.eval(input)
    if (v == null) null
    else java.lang.Boolean.valueOf(bloom.mightContainLong(v.asInstanceOf[Long]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The filter child is a foldable literal (checked above) — its
    // codegen is a constant reference, so the per-row cost is exactly
    // one mightContainLong call against the shared reference object.
    val bf = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $bf.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(filter = newLeft, value = newRight)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  /** Column-API entry point: probe serialized filter bits with a
    * BIGINT key column. */
  def mightContain(bits: Array[Byte], key: Column): Column =
    ExpressionUtils.column(BloomMightContain(
      Literal(bits, BinaryType), ExpressionUtils.expression(key)))
}
