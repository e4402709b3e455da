package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.PartitionedTable

/** Crash-injection matrix for the LSM fold path (r12 VERDICT item 8).
  * The maintain loops' per-epoch lifecycle is
  *
  *   segment write  →  fold commit (appendInto, txn-versioned)  →
  *   OPTIMIZE (compact commit)
  *
  * and replay idempotence is already spec-pinned — but nothing killed
  * the writer BETWEEN those boundaries. Each test below reconstructs
  * one torn on-disk state exactly as a dead process would leave it,
  * then proves recovery: a FRESH handle (the restarted process) sees
  * only committed state, the replayed step lands or no-ops correctly,
  * and the final serve is row-equal to a twin pipeline that never
  * crashed.
  *
  * Torn states:
  *  1. segment dir half-written          (die mid parquet write)
  *  2. fold attempt dir written, no snapshot (die before CREATE_NEW;
  *     the injected abort fires in onBeforeCommit, which runs before
  *     the cleanup block — the orphan attempt dir survives, exactly
  *     like a real crash)
  *  3. snapshot file created, MANIFEST pointer NOT swapped (die
  *     between CREATE_NEW and ATOMIC_MOVE — the orphan snapshot that
  *     "no MANIFEST points at")
  *  4. fold committed, die before OPTIMIZE (replay must NO-OP on the
  *     txn version, then compaction completes the epoch)
  *  5. compact bucket files written, compact commit aborted (reads
  *     stay on the old manifest; re-running compact converges)
  */
class FoldCrashSpec extends AnyFunSuite {
  private def spark = TestSpark.session

  private val NB = 4

  /** The epoch's inputs: a 100-row base and two 20-row segments. */
  private def base(s: SparkSession): DataFrame =
    s.range(0L, 100L).select(col("id").as("k"), (col("id") * 10L).as("v"))
  private def segRows(s: SparkSession, i: Int): DataFrame =
    s.range(100L + 20L * i, 120L + 20L * i)
      .select(col("id").as("k"), (col("id") * 10L).as("v"))

  private def table(dir: Path) = new PartitionedTable(dir, "k", NB)

  /** A handle whose commits "die" (throw) when `failOn` matches —
    * onBeforeCommit runs before the snapshot CREATE_NEW, so an abort
    * here leaves the attempt's data dir orphaned like a real kill. */
  private def crashing(dir: Path, failOn: Long => Boolean) =
    new PartitionedTable(dir, "k", NB) {
      override protected[graft] def onBeforeCommit(commit: Long): Unit =
        if (failOn(commit)) throw new RuntimeException(s"injected crash @s$commit")
    }

  private def writeSegment(dir: Path, i: Int): Path = {
    val seg = dir.resolve(f"seg$i%04d")
    segRows(spark, i).coalesce(1).write.mode("overwrite").parquet(seg.toString)
    seg
  }

  /** Build base + fold both segments + compact, no crashes — the twin
    * every recovery must equal. */
  private def twinRows(): Set[(Long, Long)] = {
    val dir = Files.createTempDirectory("graft_foldtwin")
    val pt = table(dir.resolve("t"))
    pt.appendInto(spark, base(spark), Some("seed" -> 0L))
    val segs = Seq(writeSegment(dir, 0), writeSegment(dir, 1))
    pt.appendInto(spark, spark.read.parquet(segs.map(_.toString): _*),
      Some("fold" -> 1L))
    pt.compact(spark)
    rows(pt)
  }

  private def rows(pt: PartitionedTable): Set[(Long, Long)] =
    pt.read(spark).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val expected: Set[(Long, Long)] = twinRows()

  private def seeded(): (Path, PartitionedTable) = {
    val dir = Files.createTempDirectory("graft_foldcrash")
    val pt = table(dir.resolve("t"))
    pt.appendInto(spark, base(spark), Some("seed" -> 0L))
    (dir, pt)
  }

  test("1. torn segment write: replay overwrites the half-written dir; serve equal") {
    val (dir, pt) = seeded()
    val seg0 = writeSegment(dir, 0)
    // tear segment 1 the way a dying executor leaves it: a _temporary
    // staging dir and a truncated part file, no _SUCCESS
    val torn = dir.resolve("seg0001")
    Files.createDirectories(torn.resolve("_temporary"))
    Files.write(torn.resolve("part-00000-dead.snappy.parquet"),
      Array[Byte](80, 65, 82, 49, 0, 0, 0)) // "PAR1" + garbage, truncated
    // recovery: the replayed micro-batch rewrites ITS OWN segment with
    // mode=overwrite (segment named by sub-batch id)
    val seg1b = writeSegment(dir, 1)
    val fresh = table(dir.resolve("t"))
    fresh.appendInto(spark,
      spark.read.parquet(seg0.toString, seg1b.toString), Some("fold" -> 1L))
    fresh.compact(spark)
    assert(rows(fresh) == expected)
  }

  test("2. die before snapshot CREATE_NEW: attempt dir orphaned, state intact, replay lands") {
    val (dir, pt) = seeded()
    val segs = Seq(writeSegment(dir, 0), writeSegment(dir, 1))
    val segDf = spark.read.parquet(segs.map(_.toString): _*)
    val preSnapshots = pt.snapshots
    val dying = crashing(dir.resolve("t"), _ > 0L) // seed was s0
    val boom = intercept[RuntimeException] {
      dying.appendInto(spark, segDf, Some("fold" -> 1L))
    }
    assert(boom.getMessage.contains("injected crash"))
    // the restarted process: committed state is exactly the base —
    // the orphaned attempt dir is invisible to reads
    val fresh = table(dir.resolve("t"))
    assert(fresh.snapshots == preSnapshots, "no snapshot may exist for the dead attempt")
    assert(rows(fresh) == rows(pt))
    assert(!fresh.txns.contains("fold"), "the dead fold must not be recorded")
    fresh.appendInto(spark, segDf, Some("fold" -> 1L)) // the replay
    fresh.compact(spark)
    assert(rows(fresh) == expected)
  }

  test("3. orphan snapshot (die between CREATE_NEW and pointer swap): reads stay old, replay recovers") {
    val (dir, pt) = seeded()
    val segs = Seq(writeSegment(dir, 0), writeSegment(dir, 1))
    val segDf = spark.read.parquet(segs.map(_.toString): _*)
    val tdir = dir.resolve("t")
    val pointerBefore = Files.readAllBytes(tdir.resolve("MANIFEST"))
    pt.appendInto(spark, segDf, Some("fold" -> 1L))
    val orphan = pt.snapshots.max
    // reconstruct the torn state: snapshot s<orphan> exists on disk
    // but the process died before the ATOMIC_MOVE pointer swap
    Files.write(tdir.resolve("MANIFEST"), pointerBefore)
    val fresh = table(tdir)
    assert(rows(fresh).size == 100, "reads follow the POINTER: old state only")
    assert(!fresh.txns.contains("fold"),
      "a fold whose pointer swap never landed is NOT committed")
    // the replay must land (its txn is absent from the pointed-at
    // manifest) under a NEW snapshot id — never reusing the orphan's
    fresh.appendInto(spark, segDf, Some("fold" -> 1L))
    assert(fresh.snapshots.max > orphan,
      "recovery arbitration must skip past the orphan snapshot file")
    fresh.compact(spark)
    assert(rows(fresh) == expected,
      "rows exactly once: the orphan snapshot's data dir is never read")
  }

  test("4. die between fold commit and OPTIMIZE: replay no-ops, compaction completes") {
    val (dir, pt) = seeded()
    val segs = Seq(writeSegment(dir, 0), writeSegment(dir, 1))
    val segDf = spark.read.parquet(segs.map(_.toString): _*)
    pt.appendInto(spark, segDf, Some("fold" -> 1L))
    val committedSnap = pt.snapshots.max
    // crash here; restart:
    val fresh = table(dir.resolve("t"))
    fresh.appendInto(spark, segDf, Some("fold" -> 1L)) // at-least-once replay
    assert(fresh.snapshots.max == committedSnap,
      "replayed fold must NO-OP on the recorded txn version")
    fresh.compact(spark)
    assert(rows(fresh) == expected, "no double-counted segment rows")
  }

  test("5. compact commit aborted: reads unchanged, re-running compact converges") {
    val (dir, pt) = seeded()
    val segs = Seq(writeSegment(dir, 0), writeSegment(dir, 1))
    pt.appendInto(spark, spark.read.parquet(segs.map(_.toString): _*),
      Some("fold" -> 1L))
    val manifestBefore = pt.manifest
    val dying = crashing(dir.resolve("t"), _ > pt.snapshots.max)
    intercept[RuntimeException] { dying.compact(spark) }
    val fresh = table(dir.resolve("t"))
    assert(fresh.manifest == manifestBefore,
      "aborted compact must leave the manifest untouched")
    assert(rows(fresh) == expected, "reads never see half-compacted buckets")
    val rewritten = fresh.compact(spark) // recovery: OPTIMIZE re-runs
    assert(rows(fresh) == expected)
    val m = fresh.manifest
    m.keys.foreach { b =>
      val files = PartitionedTable.listDir(
        dir.resolve("t").resolve(m(b)))
        .count(_.getFileName.toString.endsWith(".parquet"))
      assert(files <= 1, s"bucket $b not compacted after recovery")
    }
  }
}
