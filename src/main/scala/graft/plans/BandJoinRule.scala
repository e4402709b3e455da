package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Logical rewrite: point-in-interval theta join → cell-blocked
  * equi-join (the 1-D sibling of [[GridBboxJoinRule]]).
  *
  * The shape is `p BETWEEN lo AND hi` between two fact tables — the
  * IP-range lookup, time-interval enrichment, and price-band
  * classification join a curation pipeline runs constantly. Vanilla
  * Spark plans it as a BroadcastNestedLoopJoin (O(n·m) compares);
  * the reference's answer is again a Postgres index strategy. The
  * rewrite blocks both sides on fixed-width cells: the POINT side
  * gains `cell = floor(p / w)` as a narrow projection (no explode —
  * a point lives in exactly one cell, which also makes the rewrite
  * duplicate-free with no reference-cell test), the BAND side
  * explodes each interval to the cells it covers, and candidates
  * meet in a plain cell equi-join verified by the ORIGINAL
  * predicate.
  *
  * Losslessness needs only monotonicity: IEEE division by a positive
  * constant and `floor` are both monotone, so `lo <= p <= hi`
  * implies `cell(lo) <= cell(p) <= cell(hi)` — the point's cell is
  * always inside the exploded range, for any finite width, any
  * numeric types, no power-of-two requirement.
  *
  * The cell width is data-scale-dependent (an IP-range table and a
  * millisecond-timestamp table differ by 10 orders of magnitude) and
  * a logical rule cannot run stats jobs, so the width is an explicit
  * conf: `spark.graft.rules.bandJoin.cellWidth`. UNSET ⇒ the rule
  * never fires — a wrong default width is worse than Spark's plan
  * (cells 1000× too wide degrade to all-pairs; 1000× too narrow
  * explode each interval into thousands of rows). Width ≈ the median
  * interval length is the classic optimum, same reasoning as
  * `Spatial.chooseGrid`. Back-off mirrors the 2-D rule: cross-side
  * equality conjuncts (already hash-joinable), a side under
  * `spark.graft.rules.bandJoin.broadcastSkipBytes` (default: the
  * session's autoBroadcastJoinThreshold), or conf-disabled.
  *
  * A point-in-BOX join (two BETWEENs) is intentionally left to this
  * rule's first matching axis — the second axis rides along in the
  * verify — while the box×box overlap shape has 8 distinct endpoint
  * columns and is claimed by [[GridBboxJoinRule]]; the two rules
  * never fire on the same join (GridBboxJoinRule requires 8 distinct
  * attributes, a BETWEEN shape has at most 6).
  */
class BandJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  import BandJoinRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.get(EnabledKey, "true").toBoolean) return plan
    val width = session.conf.get(CellWidthKey, "").trim
    if (width.isEmpty) return plan
    val w = width.toDouble
    require(w > 0 && java.lang.Double.isFinite(w),
      s"$CellWidthKey must be a finite positive number, got $w")
    val skipBytes = session.conf.get(SkipBytesKey,
      session.sessionState.conf.autoBroadcastJoinThreshold.toString).toLong
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if eligible(left, right, cond, skipBytes) =>
        matchBand(left, right, cond) match {
          case Some(band) => rewrite(j, left, right, cond, band, w)
          case None       => j
        }
    }
  }

  private def eligible(left: LogicalPlan, right: LogicalPlan,
      cond: Expression, skipBytes: Long): Boolean = {
    val hasEqui = splitConjuncts(cond).exists {
      case EqualTo(a, b)       => crossSide(a, b, left, right)
      case EqualNullSafe(a, b) => crossSide(a, b, left, right)
      case _                   => false
    }
    def minSize = left.stats.sizeInBytes.min(right.stats.sizeInBytes)
    !hasEqui && (skipBytes < 0 || minSize > skipBytes)
  }

  private def crossSide(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
      (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))

  /** `lo <= p <= hi` with the point attribute on `pointLeft`'s side. */
  private case class Band(p: Attribute, lo: Attribute, hi: Attribute,
      pointOnLeft: Boolean)

  private def matchBand(left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[Band] = {
    // Normalize range conjuncts to (lo, hi) meaning lo ≤/< hi.
    val ranges: Seq[(Attribute, Attribute)] = splitConjuncts(cond).flatMap {
      case LessThanOrEqual(a: AttributeReference, b: AttributeReference)    => Some((a, b))
      case LessThan(a: AttributeReference, b: AttributeReference)           => Some((a, b))
      case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference) => Some((b, a))
      case GreaterThan(a: AttributeReference, b: AttributeReference)        => Some((b, a))
      case _ => None
    }.filter { case (lo, hi) => numeric(lo) && numeric(hi) }

    def side(a: Attribute): Option[Boolean] = // Some(true)=left
      if (left.outputSet.contains(a) && !right.outputSet.contains(a)) Some(true)
      else if (right.outputSet.contains(a) && !left.outputSet.contains(a)) Some(false)
      else None

    // A band is a pair of conjuncts (lo, p), (p, hi) sharing the same
    // point attribute, with lo/hi both on the opposite side — no name
    // heuristics needed, the shared attribute IS the pairing.
    val bands = for {
      (lo, p) <- ranges
      (p2, hi) <- ranges
      if p.exprId == p2.exprId
      pSide <- side(p).toSeq
      loSide <- side(lo).toSeq
      hiSide <- side(hi).toSeq
      if loSide != pSide && hiSide != pSide
    } yield Band(p, lo, hi, pSide)
    bands.headOption // any single band rewrite is lossless; extras verify
  }

  // Timestamps qualify (CAST(ts AS DOUBLE) = epoch seconds, monotone):
  // `event_ts BETWEEN session_start AND session_end` is the classic
  // event-in-session lookup; cellWidth is then in seconds.
  private def numeric(a: Attribute): Boolean = a.dataType match {
    case _: NumericType  => true
    case _: TimestampType => true
    case _               => false
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, band: Band, w: Double): LogicalPlan = {
    def cellOf(a: Attribute): Expression =
      Floor(Divide(Cast(a, DoubleType), Literal(w)))
    // Point side: one cell per row, as a projection.
    val pCell = AttributeReference("graft_pcell", LongType, nullable = true)()
    val (pointChild, bandChild) =
      if (band.pointOnLeft) (left, right) else (right, left)
    val pointProj = Project(
      pointChild.output :+ Alias(cellOf(band.p), pCell.name)(pCell.exprId),
      pointChild)
    // Band side: explode the covered cell range.
    val bCell = AttributeReference("graft_bcell", LongType, nullable = false)()
    val seq = Sequence(cellOf(band.lo), cellOf(band.hi), None,
      Some(session.sessionState.conf.sessionLocalTimeZone))
    val bandGen = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(bCell), bandChild)
    val newCond = And(EqualTo(pCell, bCell), cond)
    val (newLeft, newRight) =
      if (band.pointOnLeft) (pointProj, bandGen) else (bandGen, pointProj)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }
}

object BandJoinRule {
  val EnabledKey = "spark.graft.rules.bandJoin.enabled"
  val CellWidthKey = "spark.graft.rules.bandJoin.cellWidth"
  val SkipBytesKey = "spark.graft.rules.bandJoin.broadcastSkipBytes"

  /** Append the rule to the session's user-provided optimizer batch,
    * once. */
  def install(s: SparkSession): Unit = synchronized {
    val cur = s.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[BandJoinRule]))
      s.experimental.extraOptimizations = cur :+ new BandJoinRule(s)
  }
}
