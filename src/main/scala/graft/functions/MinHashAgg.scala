package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash sketch as a Catalyst `TypedImperativeAggregate`
  * (SURVEY.md §4 item 4 — the one genuinely custom aggregate the
  * engine needs): aggregates a set-valued column (e.g. exploded
  * shingles) into a k-slot MinHash signature per group.
  *
  * The sketch is mergeable — partial sketches combine slot-wise-min —
  * so it aggregates map-side like any algebraic function: at 100 TB
  * the shuffle carries k strings per group instead of the group's
  * whole shingle set (vs. collect_set: unbounded state).
  *
  * Hash family: per-seed md5 prefix (`md5(seed + ":" + element)`,
  * first 8 hex chars). Hex-lexicographic min ≡ numeric min of the
  * 32-bit value, and md5 is identical in every engine — the sketch is
  * reproducible outside the JVM (the DuckDB oracle recomputes it).
  *
  * Sketch Jaccard estimate: fraction of matching slots between two
  * group sketches.
  */
case class MinHashAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[String]] {

  /** Sentinel greater than every md5 hex prefix ('g' > 'f'). */
  private val Empty = "g"

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): Array[String] = Array.fill(k)(Empty)

  @transient private lazy val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private def hashPrefix(seed: Int, v: String): String = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s"$seed:$v".getBytes("UTF-8"))
    // first 4 bytes -> 8 hex chars
    val sb = new java.lang.StringBuilder(8)
    var i = 0
    while (i < 4) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bytes(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var seed = 0
      while (seed < k) {
        val h = hashPrefix(seed, s)
        if (h.compareTo(buf(seed)) < 0) buf(seed) = h
        seed += 1
      }
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) { if (b(i).compareTo(a(i)) < 0) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[String]): Any =
    new GenericArrayData(buf.map(s => UTF8String.fromString(s): Any))

  override def serialize(buf: Array[String]): Array[Byte] =
    buf.mkString(",").getBytes("UTF-8")

  override def deserialize(bytes: Array[Byte]): Array[String] =
    new String(bytes, "UTF-8").split(",", -1)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_sketch"
}

object MinHashAgg {
  /** Column-API entry point: `minhash_sketch(col, k)`. */
  def minhashSketch(c: Column, k: Int): Column =
    ExpressionUtils.column(
      MinHashAgg(ExpressionUtils.expression(c), k).toAggregateExpression())
}
