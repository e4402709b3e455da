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

/** Two-level (TIERED) fold-cadence policy — the r15 VERDICT item 3
  * answer to the single-level LSM's scale wall: MAINTAIN_r15 measured
  * per-fold cost growing 8.2 → 27.6 s WITHIN one sf1 epoch, because
  * every mid-epoch fold rewrote the whole standing base. Classic
  * size-tiered compaction splits the price:
  *
  *   - fold-to-RUN: merge the loose segments into one run file set —
  *     O(epoch arrivals), FLAT across the epoch. Removes
  *     (segments − 1) leaves from the union read path.
  *   - fold-to-BASE: land runs + segments in the bucketed base —
  *     O(standing index), the expensive rewrite, paid once per epoch
  *     close or when the RUN leaves themselves have accrued its price.
  *
  * Rent-or-buy per level: the tax attributable to loose segments
  * accrues against the (cheap) run-fold price; the tax attributable
  * to runs accrues against the (expensive) base-fold price. Each
  * level independently keeps its total cost within 2× of the
  * clairvoyant schedule for the leaves it owns. A write-only epoch
  * accrues no tax at either level, so the only fold is the `finish()`
  * close fold straight to base — the same degenerate cadence as the
  * single-level [[FoldPolicy]], gate behavior unchanged.
  *
  * Tax is priced per FILE, not per leaf dir (r17): what a serve
  * actually pays per unfolded leaf is the per-file open/footer/scan
  * setup on the union read path, so a leaf's weight is its parquet
  * file count. MAINTAIN_r17 measured the difference directly — one
  * size-coalesced run of 32 segments serves at BASE cost (sf1: 1.497
  * vs 1.507 s; run_files=1) while the 32 loose multi-file segments it
  * replaced cost 6.17 s. The r16 uniform per-leaf tax priced that
  * ~free 1-file run like a full segment, so outstanding runs accrued
  * phantom tax that bought O(standing) base folds nobody had paid for
  * (sf1 tiered loop: 3 realized base folds, 116.7 s total fold time
  * vs single-level's 21.6 s). File-weighted accrual restores the
  * 2-competitive bound per level against the cost queries actually
  * pay. Leaves with no stated weight default to 1 file.
  *
  * Estimation is online (EWMA per cost, shared per-file tax), seeded
  * from probe curves exactly like [[FoldPolicy]]. */
final class TieredFoldPolicy(
    initialRunFoldCostSec: Double,
    initialBaseFoldCostSec: Double,
    initialTaxPerFileSec: Double,
    alpha: Double = 0.3) {
  require(initialRunFoldCostSec > 0 && initialBaseFoldCostSec > 0 &&
    initialTaxPerFileSec >= 0)
  require(alpha > 0 && alpha <= 1)

  private var runCost = initialRunFoldCostSec
  private var baseCost = initialBaseFoldCostSec
  private var tax = initialTaxPerFileSec
  private var segments = 0
  private var runs = 0
  private var segFiles = 0
  private var runFiles = 0
  private var segTaxSec = 0.0
  private var runTaxSec = 0.0

  /** A micro-batch landed as one more loose segment of `files`
    * parquet files (the weight a serve pays for it). */
  def onSegment(files: Int = 1): Unit = {
    require(files >= 1, s"a segment has at least one file, got $files")
    segments += 1
    segFiles += files
  }

  /** A query was served over base + runs + segments; accrue the tax
    * it paid, attributed per leaf level, weighted by file count. */
  def onServe(observedServeSec: Option[Double] = None,
      baselineServeSec: Double = 0.0): Unit = {
    observedServeSec.foreach { obs =>
      val files = segFiles + runFiles
      if (files > 0) {
        val perFile = math.max(0.0, (obs - baselineServeSec) / files)
        tax = (1 - alpha) * tax + alpha * perFile
      }
    }
    segTaxSec += segFiles * tax
    runTaxSec += runFiles * tax
  }

  /** Fold loose segments to a run once THEIR accrued tax reaches the
    * run-fold price (≥2 segments — folding one is a pure rename). */
  def shouldFoldToRun: Boolean = segments > 1 && segTaxSec >= runCost

  /** Fold everything to base once the RUN leaves' accrued tax reaches
    * the base-fold price — the O(standing) rewrite triggers only when
    * queries have actually paid for it. */
  def shouldFoldToBase: Boolean = runs > 0 && runTaxSec >= baseCost

  /** The loose segments were merged into one run of `newRunFiles`
    * parquet files (size-coalesced — LsmFold.mergeRun reports the
    * real count, typically 1 at small tiers). */
  def onFoldToRun(observedFoldSec: Option[Double] = None,
      newRunFiles: Int = 1): Unit = {
    require(newRunFiles >= 1, s"a run has at least one file, got $newRunFiles")
    observedFoldSec.foreach(f => runCost = (1 - alpha) * runCost + alpha * f)
    runs += 1
    runFiles += newRunFiles
    segments = 0
    segFiles = 0
    segTaxSec = 0.0
  }

  def onFoldToBase(observedFoldSec: Option[Double] = None): Unit = {
    observedFoldSec.foreach(f => baseCost = (1 - alpha) * baseCost + alpha * f)
    runs = 0
    segments = 0
    segFiles = 0
    runFiles = 0
    segTaxSec = 0.0
    runTaxSec = 0.0
  }

  def unfoldedSegments: Int = segments
  def unfoldedRuns: Int = runs
  def unfoldedLeaves: Int = segments + runs
  def unfoldedSegmentFiles: Int = segFiles
  def unfoldedRunFiles: Int = runFiles
  def estimatedRunFoldCost: Double = runCost
  def estimatedBaseFoldCost: Double = baseCost
  def estimatedTaxPerFile: Double = tax
}

/** Threads a [[TieredFoldPolicy]] through a maintain loop's two fold
  * closures. `foldToRun` merges the CURRENT loose segments into a new
  * run (LsmFold.mergeRun), clears the segment store, and RETURNS the
  * new run's parquet file count (its serve-path weight — the policy
  * prices leaves per file, r17); `foldToBase` lands runs + loose
  * segments in the bucketed base (LsmFold.foldToBase) and clears both
  * stores. The folder times each fold into the policy's online
  * estimates. `finish()` closes the epoch with one base fold — the
  * write-only degenerate case is then exactly the pre-r16
  * one-close-fold cadence. */
final class TieredPolicyFolder(val policy: TieredFoldPolicy,
    foldToRun: () => Int, foldToBase: () => Unit) {
  private var rFolds = 0
  private var bFolds = 0

  private def timedRun(): Unit = {
    val t0 = System.nanoTime()
    val newFiles = foldToRun()
    policy.onFoldToRun(Some((System.nanoTime() - t0) / 1e9),
      math.max(1, newFiles))
    rFolds += 1
  }

  private def timedBase(): Unit = {
    val t0 = System.nanoTime()
    foldToBase()
    policy.onFoldToBase(Some((System.nanoTime() - t0) / 1e9))
    bFolds += 1
  }

  def onSegment(files: Int = 1): Unit = policy.onSegment(files)

  def onServe(observedServeSec: Option[Double] = None,
      baselineServeSec: Double = 0.0): Unit = {
    policy.onServe(observedServeSec, baselineServeSec)
    if (policy.shouldFoldToBase) timedBase()
    else if (policy.shouldFoldToRun) timedRun()
  }

  /** Epoch close: land any unfolded remainder in the base. */
  def finish(): Unit = if (policy.unfoldedLeaves > 0) timedBase()

  def realizedRunFolds: Int = rFolds
  def realizedBaseFolds: Int = bFolds
}

object TieredPolicyFolder {
  /** Default seed: run folds priced at the measured O(batch) segment
    * write scale (MAINTAIN_r13 sf0.1 segment_write ≈ 0.4 s), base
    * folds at the measured epoch fold (2.6 s), tax per file from the
    * serve-vs-segments slope (0.15 s — the probe's segments are
    * ~1-file, so slope/segment ≈ slope/file as a seed; the EWMA
    * recalibrates from the first observed serve). */
  def defaultPolicy(): TieredFoldPolicy = new TieredFoldPolicy(
    initialRunFoldCostSec = 0.4, initialBaseFoldCostSec = 2.6,
    initialTaxPerFileSec = 0.15)
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
