package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Replication
import java.nio.file.Files

/** Lease takeover for the single-writer lock (r8 VERDICT item 7): the
  * reference documents that a crash leaves replication locked forever
  * (`changesetmd.py:163-164`); our lock must steal a stale lease and
  * still refuse a live one. */
class LockSpec extends AnyFunSuite {

  private def lockDir() = Files.createTempDirectory("graft_lock")

  private def deadPid(): Long = {
    var p = 4000000L
    while (ProcessHandle.of(p).isPresent) p -= 1
    p
  }

  test("a crashed holder's lock (dead pid) is stolen; the run proceeds") {
    val dir = lockDir()
    Files.write(dir.resolve("LOCK"),
      s"${deadPid()} ${System.currentTimeMillis}".getBytes("UTF-8"))
    val ran = Replication.withWriterLock(dir) { true }
    assert(ran)
    assert(!Files.exists(dir.resolve("LOCK")), "lock released after the stolen run")
  }

  test("a silent holder (live pid, heartbeat past the horizon) is stolen") {
    val dir = lockDir()
    val staleTs = System.currentTimeMillis - Replication.StaleAfterMillis - 60000
    Files.write(dir.resolve("LOCK"),
      s"${ProcessHandle.current.pid} $staleTs".getBytes("UTF-8"))
    assert(Replication.withWriterLock(dir) { true })
  }

  test("a live holder with a fresh heartbeat still refuses a second writer") {
    val dir = lockDir()
    val refused = Replication.withWriterLock(dir) {
      intercept[IllegalStateException] { Replication.withWriterLock(dir) { () } }
      true
    }
    assert(refused)
    assert(!Files.exists(dir.resolve("LOCK")))
  }

  test("an unreadable lock file (no payload) is treated as stale, not a deadlock") {
    val dir = lockDir()
    Files.write(dir.resolve("LOCK"), Array.emptyByteArray)
    assert(Replication.withWriterLock(dir) { true })
  }
}
