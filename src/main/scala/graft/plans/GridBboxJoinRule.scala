package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Logical rewrite: bbox-overlap theta join → lossless grid equi-join.
  *
  * The reference answers spatial-overlap queries by letting Postgres
  * pick a GiST index scan (`queries.py:41-51` installs PostGIS and an
  * index on the changeset geometry); a user writes the plain
  * `ST_Intersects`/interval predicate and the PLANNER supplies the
  * physical strategy. Spark has no such strategy: a join whose only
  * condition is four range comparisons plans as
  * BroadcastNestedLoopJoin (or a cartesian product) — O(n·m) compare
  * work, the canonical 100 TB scale-killer. This rule restores the
  * reference's division of labor on Spark terms: users keep writing
  * the declarative overlap join; the optimizer rewrites it into the
  * grid-cell equi-join form that `Spatial.joinBboxGridG` exposes as
  * an explicit operator — explode each box to the coarse grid cells
  * it covers, equi-join on the cell, verify with the ORIGINAL
  * predicate, and keep each qualifying pair exactly once via the
  * reference-cell predicate (the cell containing the intersection's
  * min corner — Patel & DeWitt's PBSM duplicate-avoidance test).
  *
  * Shape matched: an inner join whose condition contains (possibly
  * among extra conjuncts) comparisons forming interval overlap on two
  * axes (box×box) or ONE axis (interval×interval — the temporal /
  * session-overlap join, with a single cell dimension and no second
  * Generate):
  *
  *   l_min1 <= r_max1 && r_min1 <= l_max1 &&     -- axis 1
  *   l_min2 <= r_max2 && r_min2 <= l_max2        -- axis 2 (optional)
  *
  * where every endpoint is a bare numeric column ( `<`/`<=`/`>`/`>=`
  * all accepted; extra conjuncts ride along in the verify). The two
  * (left-lo, right-hi) and two (right-lo, left-hi) conjuncts are
  * paired into axes by column-name stem — `min`/`max` tokens stripped
  * (`min_lon` and `max_lon` share stem `_lon`) — and the rule backs
  * off to Spark's default planning whenever the pairing is not
  * unambiguous: a wrong axis pairing could silently DROP pairs, so
  * ambiguity must never be guessed at. Rewriting is also skipped when
  *
  *   - the join has any cross-side equality conjunct (Spark already
  *     hash-joins it; the range predicates are then mere residuals),
  *   - either side's estimated size is under
  *     `spark.graft.rules.gridJoin.broadcastSkipBytes` (default: the
  *     session's `autoBroadcastJoinThreshold`) — a broadcast nested
  *     loop against a tiny dimension beats two exploded shuffles, and
  *     matches how `Spatial.joinRangeBbox` wants to plan, or
  *   - `spark.graft.rules.gridJoin.enabled` is `false`.
  *
  * Losslessness (also for degenerate `min > max` intervals): for a
  * pair passing the overlap conjuncts, the per-axis reference point
  * `max(l_min, r_min)` lies in BOTH boxes' covered-cell hulls
  * (`l_min` is a hull endpoint of the left box; `r_min <= l_max`
  * puts it inside the right hull, and symmetrically), so the cell
  * containing it is produced by both explodes, and the dedup
  * predicate `l_min < chx && r_min < chx && (l_min >= clx ||
  * r_min >= clx)` selects exactly that one shared cell. The cell
  * size (`spark.graft.rules.gridJoin.cellDeg`, default 4) must be a
  * power of two so `floor(x/g)` and the `c·g` cell bounds are exact
  * binary scalings — the floor form and the range form of "cell
  * contains x" are then bit-equal for every finite coordinate
  * (`Spatial.isPow2` is the same discipline).
  *
  * Installed per-session via [[GridBboxJoinRule.install]]
  * (`spark.experimental.extraOptimizations` — public API, runs as
  * the optimizer's user-provided batch) or for every session via
  * `spark.sql.extensions=graft.functions.GraftExtensions`
  * (`injectOptimizerRule`). The rewrite never fires twice on its own
  * output: the rewritten join carries cell equality conjuncts, which
  * the equi-join guard sees.
  */
class GridBboxJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  import GridBboxJoinRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.get(EnabledKey, "true").toBoolean) return plan
    val g = session.conf.get(CellDegKey, "4.0").toDouble
    require(graft.operators.Spatial.isPow2(g),
      s"$CellDegKey must be a positive power of two, got $g")
    val skipBytes = session.conf.get(SkipBytesKey,
      session.sessionState.conf.autoBroadcastJoinThreshold.toString).toLong
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if eligible(j, left, right, cond, skipBytes) =>
        matchOverlap(left, right, cond) match {
          case Some(axes) => rewrite(j, left, right, cond, axes, g)
          case None       => j
        }
    }
  }

  /** Cheap structural guards, checked before the conjunct analysis. */
  private def eligible(j: Join, left: LogicalPlan, right: LogicalPlan,
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

  /** One overlap axis: left interval [lLo, lHi], right [rLo, rHi],
    * established by conjuncts `lLo ≤ rHi` and `rLo ≤ lHi`. */
  private case class Axis(lLo: Attribute, lHi: Attribute,
      rLo: Attribute, rHi: Attribute)

  /** Find the overlap shape in the condition: two axes (box×box) or
    * one axis (interval×interval — the temporal/session overlap join
    * `l_start <= r_end && r_start <= l_end`). None if ambiguous. */
  private def matchOverlap(left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[Seq[Axis]] = {
    // Normalize each range conjunct to (lo, hi) meaning lo ≤/< hi.
    val ranges: Seq[(Attribute, Attribute)] = splitConjuncts(cond).flatMap {
      case LessThanOrEqual(a: AttributeReference, b: AttributeReference) => Some((a, b))
      case LessThan(a: AttributeReference, b: AttributeReference)        => Some((a, b))
      case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference) => Some((b, a))
      case GreaterThan(a: AttributeReference, b: AttributeReference)    => Some((b, a))
      case _ => None
    }.filter { case (lo, hi) => numeric(lo) && numeric(hi) }

    def inLeft(a: Attribute) = left.outputSet.contains(a) && !right.outputSet.contains(a)
    def inRight(a: Attribute) = right.outputSet.contains(a) && !left.outputSet.contains(a)

    // Type A: left-lo ≤ right-hi.  Type B: right-lo ≤ left-hi.
    val aConj = ranges.collect { case (lo, hi) if inLeft(lo) && inRight(hi) => (lo, hi) }
    val bConj = ranges.collect { case (lo, hi) if inRight(lo) && inLeft(hi) => (lo, hi) }

    // Pair A and B conjuncts into axes by name stem; refuse ambiguity.
    def key(l: Attribute, r: Attribute) = (stem(l.name), stem(r.name))
    val aByKey = aConj.groupBy { case (lo, hi) => key(lo, hi) }
    val bByKey = bConj.groupBy { case (lo, hi) => key(hi, lo) }
    val shared = aByKey.keySet.intersect(bByKey.keySet)
    val axes = shared.toSeq.sortBy(_.toString).flatMap { k =>
      (aByKey(k), bByKey(k)) match {
        case (Seq((lLo, rHi)), Seq((rLo, lHi))) => Some(Axis(lLo, lHi, rLo, rHi))
        case _                                  => None // >1 candidate: ambiguous
      }
    }
    def allDistinct(as: Seq[Axis]) = {
      val flat = as.flatMap(a => Seq(a.lLo, a.lHi, a.rLo, a.rHi))
      flat.distinct.length == flat.length
    }
    axes match {
      case Seq(a, b) if allDistinct(Seq(a, b)) => Some(Seq(a, b))
      // one clean axis with 4 distinct endpoints: the 1-D interval
      // overlap (a 3-endpoint BETWEEN shape is BandJoinRule's)
      case Seq(a) if allDistinct(Seq(a))       => Some(Seq(a))
      case _                                   => None
    }
  }

  // Timestamps qualify too: CAST(ts AS DOUBLE) is epoch seconds —
  // monotone, and exact under a power-of-two cell size like any other
  // double. The session-overlap join is this rule's 1-D shape on a
  // time axis. (Mixed-type axes never reach here: coercion wraps one
  // side in a Cast, which the bare-attribute matcher rejects.)
  private def numeric(a: Attribute): Boolean = a.dataType match {
    case _: NumericType  => true
    case _: TimestampType => true
    case _               => false
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, axes: Seq[Axis], g: Double): LogicalPlan = {
    val names = Seq("graft_cx", "graft_cy")
    val (leftGen, lCells) = withCells(left, axes.map(a => (a.lLo, a.lHi)), names, g)
    val (rightGen, rCells) = withCells(right, axes.map(a => (a.rLo, a.rHi)), names, g)
    val cellEq = lCells.zip(rCells)
      .map { case (lc, rc) => EqualTo(lc, rc): Expression }.reduce(And(_, _))
    val dedups = axes.zip(lCells)
      .map { case (ax, lc) => dedup(lc, ax.lLo, ax.rLo, g) }.reduce(And(_, _))
    Project(j.output,
      Join(leftGen, rightGen, Inner, Some(And(cellEq, And(dedups, cond))), j.hint))
  }

  /** Stack one Generate(Explode(sequence(floor(lo/g), floor(hi/g))))
    * node per axis over the child — one cell row per cell tuple the
    * box/interval covers. `sequence` walks descending bounds too, so
    * a degenerate `min > max` box still covers its hull. */
  private def withCells(child: LogicalPlan, bounds: Seq[(Attribute, Attribute)],
      names: Seq[String], g: Double): (LogicalPlan, Seq[Attribute]) = {
    def cellIdx(a: Attribute): Expression =
      Cast(Floor(Divide(Cast(a, DoubleType), Literal(g))), IntegerType)
    bounds.zip(names).foldLeft((child, Seq.empty[Attribute])) {
      case ((c, outs), ((lo, hi), name)) =>
        val out = AttributeReference(name, IntegerType, nullable = false)()
        // Sequence is TimeZoneAwareExpression: it only reports resolved
        // once a zone is pinned (irrelevant for integer bounds, but the
        // optimizer's plan-validation checks resolution, not relevance).
        val seq = Sequence(cellIdx(lo), cellIdx(hi), None,
          Some(session.sessionState.conf.sessionLocalTimeZone))
        (Generate(Explode(seq),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(out), c), outs :+ out)
    }
  }

  /** Reference-cell test on one axis: this cell contains
    * `max(lLo, rLo)` — i.e. `clx <= max < chx`, expanded so both
    * operands stay simple comparisons the join can codegen. */
  private def dedup(cell: Attribute, lLo: Attribute, rLo: Attribute,
      g: Double): Expression = {
    val cl = Multiply(Cast(cell, DoubleType), Literal(g))
    val ch = Multiply(Add(Cast(cell, DoubleType), Literal(1.0)), Literal(g))
    def d(a: Attribute) = Cast(a, DoubleType)
    And(And(LessThan(d(lLo), ch), LessThan(d(rLo), ch)),
      Or(GreaterThanOrEqual(d(lLo), cl), GreaterThanOrEqual(d(rLo), cl)))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }
}

object GridBboxJoinRule {
  val EnabledKey = "spark.graft.rules.gridJoin.enabled"
  val CellDegKey = "spark.graft.rules.gridJoin.cellDeg"
  val SkipBytesKey = "spark.graft.rules.gridJoin.broadcastSkipBytes"

  /** Append the rule to the session's user-provided optimizer batch,
    * once (public `experimental` API — no extensions file needed for
    * an existing session, e.g. the verify harness's). */
  def install(s: SparkSession): Unit = synchronized {
    val cur = s.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[GridBboxJoinRule]))
      s.experimental.extraOptimizations = cur :+ new GridBboxJoinRule(s)
  }

  /** Endpoint-role tokens: the vocabulary a bound column's name uses
    * to say which end of the interval it is. */
  private val RoleTokens = Set("min", "max", "lo", "hi", "low", "high",
    "start", "end", "begin", "stop", "from", "to", "first", "last")

  /** Axis-pairing stem: lowercase, split on `_`, drop endpoint-role
    * TOKENS — `min_lon`/`max_lon` → `lon`, `session_start`/
    * `session_end` → `session`, `band_lo`/`band_hi` → `band`. Tokens
    * only, never substrings (stripping `lo` from `lon` would cross
    * axes). Two columns naming the same axis must collapse to the
    * same stem; columns that cannot be paired this way make the rule
    * back off, never guess. */
  private[plans] def stem(name: String): String =
    name.toLowerCase.split('_').filterNot(RoleTokens.contains).mkString("_")
}
