package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ChaosDuel

/** N-writer × M-round chaos fencing duel with SIGKILL and
  * SIGSTOP+steal injection (r14 VERDICT item 4): global invariants —
  * exactly one committed batch per round, monotone fencing
  * generations across the snapshot chain, final table = replay of
  * accepted commits. FenceDuelSpec proves each adversary once; this
  * proves they compose over a contended run. */
class ChaosDuelSpec extends AnyFunSuite {

  test("3 writers x 6 rounds with kill + freeze/steal injection hold the invariants") {
    val work = Files.createTempDirectory("graft_chaos_spec")
    val r = ChaosDuel.run(work, nWriters = 3, rounds = 6, seed = 14L)
    assert(r.violations.isEmpty, r.violations.mkString("; "))
    assert(r.kills === 1)
    assert(r.winners.size === 6, s"winners: ${r.winners}")
    // every round has exactly one winning writer
    assert(r.winners.keySet === (0 until 6).toSet)
    // generations never regress and takeovers bumped them
    assert(r.fenceGens.nonEmpty)
    assert(r.fenceGens.sliding(2).forall {
      case Seq(a, b) => b >= a
      case _ => true
    })
    if (r.stealsCommitted > 0)
      assert(r.fenceGens.last >= 2L, s"gens ${r.fenceGens}")
  }
}
