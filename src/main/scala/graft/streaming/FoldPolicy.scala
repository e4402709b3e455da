package graft.streaming

/** Fold-cadence policy for the LSM maintenance loops (bm25 / ann /
  * dedup): decide WHEN to fold accumulated segments into the bucketed
  * base from the two quantities MAINTAIN_r13.json measures —
  *
  *   - the serve tax: each unfolded segment adds one leaf scan to the
  *     union read path, a near-LINEAR latency tax per segment
  *     (measured 0.77 s at 0 segments → 5.66 s at 32 on the sf0.1
  *     postings index ≈ 0.15 s/segment/query);
  *   - the fold cost: one O(standing-index) bucketed merge per fold
  *     (measured 2.6 s sf0.1 / 7.8 s sf1).
  *
  * The rule is the classic rent-or-buy amortization (ski rental):
  * accrue the tax actually paid by serves since the last fold, and
  * fold once the accrued tax matches the fold cost. Total cost is
  * then at most 2× the clairvoyant schedule, whatever the serve/write
  * mix — bursty writes with no reads accrue no tax and never trigger
  * a pointless fold; read-heavy epochs fold early because queries are
  * actually paying the union-scan tax.
  *
  * Estimation is online: the policy learns `taxPerSegment` and
  * `foldCost` from observed serve/fold timings (EWMA), seeded from
  * the probe curve, so a deployment self-tunes as the standing index
  * grows. Pure driver-side arithmetic — nothing here touches the
  * data path.
  */
final class FoldPolicy(
    initialFoldCostSec: Double,
    initialTaxPerSegmentSec: Double,
    alpha: Double = 0.3) {
  require(initialFoldCostSec > 0 && initialTaxPerSegmentSec >= 0)
  require(alpha > 0 && alpha <= 1)

  private var foldCost = initialFoldCostSec
  private var tax = initialTaxPerSegmentSec
  private var segments = 0
  private var accruedTaxSec = 0.0

  /** A micro-batch landed as one more unfolded segment. */
  def onSegment(): Unit = segments += 1

  /** A query was served over base + `segments` segments; accrue the
    * tax it actually paid. Passing the OBSERVED serve seconds (vs the
    * zero-segment baseline) refines the tax estimate online. */
  def onServe(observedServeSec: Option[Double] = None,
      baselineServeSec: Double = 0.0): Unit = {
    observedServeSec.foreach { obs =>
      if (segments > 0) {
        val perSeg = math.max(0.0, (obs - baselineServeSec) / segments)
        tax = (1 - alpha) * tax + alpha * perSeg
      }
    }
    accruedTaxSec += segments * tax
  }

  /** Fold when the tax queries have actually paid since the last fold
    * reaches the price of folding. */
  def shouldFold: Boolean = accruedTaxSec >= foldCost

  /** A fold ran (and was measured); reset the epoch. */
  def onFold(observedFoldSec: Option[Double] = None): Unit = {
    observedFoldSec.foreach(f => foldCost = (1 - alpha) * foldCost + alpha * f)
    segments = 0
    accruedTaxSec = 0.0
  }

  def unfoldedSegments: Int = segments
  def accruedTax: Double = accruedTaxSec
  def estimatedFoldCost: Double = foldCost
  def estimatedTaxPerSegment: Double = tax
}

/** Threads a [[FoldPolicy]] through an LSM maintain loop's actual
  * fold machinery (r14 VERDICT item 3 — the policy used to be
  * spec-only). The loop calls `onSegment()` when a micro-batch lands
  * a segment, `onServe(...)` when a query reads base ∪ segments, and
  * `finish()` at epoch close; `foldNow` is the loop's own fold —
  * land every currently-unfolded segment in the bucketed base and
  * clear the segment store.
  *
  * Cadence semantics: a WRITE-ONLY epoch (the gate entries' shape —
  * no queries between triggers) accrues no tax, so the only fold is
  * the `finish()` close fold: exactly the pre-r15 one-fold-per-epoch
  * behavior, now as the policy's degenerate case rather than a
  * hardcoded constant. A serve-interleaved deployment (the
  * MaintainProbe policy loop) folds mid-epoch at the rent-or-buy
  * points. Mid-epoch folds are replay-safe STRUCTURALLY (r16): each
  * fold records its sub-batch ids as txn markers atomically with the
  * data commit, and the fold path filters already-folded ids — a
  * replayed sub-batch can never re-land, whatever the loop does
  * (spec: FoldReplaySpec). */
final class PolicyFolder(val policy: FoldPolicy, foldNow: () => Unit) {
  private var folds = 0

  private def timedFold(): Unit = {
    val t0 = System.nanoTime()
    foldNow()
    policy.onFold(Some((System.nanoTime() - t0) / 1e9))
    folds += 1
  }

  /** A micro-batch landed one more unfolded segment. */
  def onSegment(): Unit = policy.onSegment()

  /** A query was served over base + unfolded segments; fold right
    * after the serve if the accrued tax has reached the fold price. */
  def onServe(observedServeSec: Option[Double] = None,
      baselineServeSec: Double = 0.0): Unit = {
    policy.onServe(observedServeSec, baselineServeSec)
    if (policy.shouldFold && policy.unfoldedSegments > 0) timedFold()
  }

  /** Epoch close: land any unfolded remainder. */
  def finish(): Unit = if (policy.unfoldedSegments > 0) timedFold()

  def realizedFolds: Int = folds
}

object PolicyFolder {
  /** The maintain loops' default seed — the MAINTAIN_r13.json sf0.1
    * bm25 measurements (fold 2.6 s, serve tax ≈0.15 s/segment/query;
    * `FoldPolicy.steadyStateTrigger` = 6). A deployment's own EWMA
    * updates take over from the first observed fold/serve. */
  def defaultPolicy(): FoldPolicy = new FoldPolicy(
    initialFoldCostSec = 2.6, initialTaxPerSegmentSec = 0.15)
}

object FoldPolicy {

  /** Least-squares slope of the measured serve-vs-segments curve —
    * how a deployment seeds `taxPerSegment` from a MAINTAIN probe
    * artifact's `serve_sec_by_unfolded_segments` points. */
  def estimateTaxPerSegment(curve: Seq[(Int, Double)]): Double = {
    require(curve.size >= 2, "need at least two curve points")
    require(curve.map(_._1).distinct.size >= 2,
      "need at least two DISTINCT segment counts (den=0 otherwise)")
    val n = curve.size.toDouble
    val mx = curve.map(_._1).sum / n
    val my = curve.map(_._2).sum / n
    val num = curve.map { case (x, y) => (x - mx) * (y - my) }.sum
    val den = curve.map { case (x, _) => (x - mx) * (x - mx) }.sum
    num / den
  }

  /** The analytic trigger under a steady 1-serve-per-segment cadence:
    * after k segments the accrued tax is tax·k(k+1)/2, so the fold
    * fires at the smallest k with tax·k(k+1)/2 ≥ foldCost. Exposed
    * for probes/specs to pin where the policy lands on a measured
    * curve. */
  def steadyStateTrigger(foldCostSec: Double, taxPerSegmentSec: Double): Int = {
    require(foldCostSec > 0 && taxPerSegmentSec > 0)
    Iterator.from(1)
      .dropWhile(k => taxPerSegmentSec * k * (k + 1) / 2.0 < foldCostSec)
      .next()
  }
}
