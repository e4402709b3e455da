package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitter CANDIDATE sketch (Metwally, Agrawal &
  * El Abbadi, "Efficient computation of frequent and top-k elements
  * in data streams", ICDT 2005) as a mergeable Catalyst
  * `TypedImperativeAggregate`: constant m-entry state per group where
  * `collect_list`+count would buffer the group's whole token stream.
  *
  * Returns the candidate SET (array of values, sorted for
  * determinism), not estimated counts: the guarantee that matters for
  * a distributed top-k pipeline is recall — any value with true
  * frequency > n/m is in the summary (and merged summaries keep the
  * union's guarantee with capacity m over the combined stream since
  * count mass is preserved). The caller re-counts the candidates
  * EXACTLY in a second pass (`operators/TextAnalysis.aggHeavyHitters`),
  * so approximate counts never reach a result — the standard
  * sketch-then-verify shape this engine uses everywhere
  * (LSH→Jaccard, banding→Hamming, cells→cosine).
  *
  * Merge adds counts for shared keys and keeps the top-m entries by
  * (count, value) — the count mass of dropped entries is bounded by
  * the m-th count, preserving the n/m error bound (Agarwal et al.,
  * "Mergeable summaries", PODS 2012).
  */
case class SpaceSavingAgg(child: Expression, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  require(m > 0, s"space_saving needs capacity > 0, got $m")

  type Buf = scala.collection.mutable.HashMap[String, Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // SQL-registered (`space_saving`): reject wrong-typed input at
  // analysis rather than ClassCastException inside update() (DotF32
  // pattern; ExpectsInputTypes needs private[sql] types).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"space_saving requires STRING, got ${t.simpleString}")
    }

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < m => buf.update(s, 1L)
        case None =>
          // replace the min-count entry (ties: smallest value — a
          // fixed rule, same on every executor); new count = min + 1
          val (mk, mc) = buf.minBy { case (k, c) => (c, k) }
          buf.remove(mk)
          buf.update(s, mc + 1)
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > m) {
      // keep top-m by (count desc, value asc) — deterministic
      val keep = a.toSeq.sortBy { case (k, c) => (-c, k) }.take(m)
      a.clear()
      keep.foreach { case (k, c) => a.update(k, c) }
    }
    a
  }

  /** Candidate set only, sorted — counts are sketch-estimates and
    * deliberately not exposed. */
  override def eval(buf: Buf): Any =
    new GenericArrayData(
      buf.keys.toArray.sorted.map(s => UTF8String.fromString(s): Any))

  // Length-prefixed binary layout -- [entryCount:int] then per entry
  // [keyLen:int][keyBytes][count:long]. No sentinel characters:
  // space_saving is SQL-registered and sees arbitrary user strings,
  // so keys may legitimately contain any code point (including the
  // ASCII separators a delimiter scheme would corrupt on).
  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val buf = new Buf()
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.update(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "space_saving"
}

object SpaceSavingAgg {
  /** Column-API entry point: `space_saving(col, m)` → candidate array. */
  def spaceSaving(c: Column, m: Int): Column =
    ExpressionUtils.column(
      SpaceSavingAgg(ExpressionUtils.expression(c), m).toAggregateExpression())
}
