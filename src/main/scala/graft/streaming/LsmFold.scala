package graft.streaming

import org.apache.spark.sql.SparkSession
import java.nio.file.Path

/** Shared physical fold kernels for the LSM maintain loops (bm25 /
  * ann / dedup) — the two levels of the r16 TIERED fold:
  *
  *   segments --foldToRun--> runs --foldToBase--> bucketed base
  *
  * A PART is (constituent sub-batch ids, parquet dir): a loose
  * segment is a single-id part, a RUN is a many-id part produced by
  * `mergeRun`. Both land in the base through `foldToBase`, which is
  * REPLAY-SAFE structurally: each base fold commits one
  * `<app>.seg<k>` txn marker per constituent sub-batch id atomically
  * with the data (PartitionedTable.alsoRecord), and parts whose ids
  * the table has already folded are filtered here — a replayed
  * already-folded sub-batch can never re-land, whatever the loop
  * around the fold does (FoldReplaySpec).
  *
  * Cost shapes (the reason the run level exists — r15 VERDICT
  * item 3): `mergeRun` reads only THESE segments' rows and writes one
  * merged dir — O(epoch arrivals so far), flat across the epoch;
  * `foldToBase` is the bucketed-base rewrite — O(standing index),
  * the price MAINTAIN_r15 measured growing 8.2 → 27.6 s within one
  * sf1 epoch when every mid-epoch fold paid it. Tiered, mid-epoch
  * folds pay the flat run price and the standing-index price is paid
  * once per epoch (or when the run tax has genuinely accrued to it —
  * TieredFoldPolicy). */
object LsmFold {

  /** Merge segment parts into ONE run dir — O(these rows), never
    * O(standing). Returns the run as a part carrying every
    * constituent sub-batch id (the base fold's marker set). */
  def mergeRun(s: SparkSession, runDir: Path, runId: Int,
      segs: Seq[(Int, Path)]): (Seq[Int], Path) = {
    require(segs.nonEmpty, "mergeRun needs at least one segment")
    java.nio.file.Files.createDirectories(runDir)
    val p = runDir.resolve(f"run$runId%04d")
    s.read.parquet(segs.map(_._2.toString).distinct: _*)
      .write.mode("overwrite").parquet(p.toString)
    (segs.map(_._1).distinct, p)
  }

  /** Land parts (segments and/or runs) into the bucketed base in one
    * commit, refusing parts whose sub-batch ids are all already
    * folded. `merge=false` → appendInto (postings/bands/codes),
    * `merge=true` → mergeInto (doclens/sets — keyed upserts). */
  def foldToBase(s: SparkSession, t: PartitionedTable, app: String,
      parts: Seq[(Seq[Int], Path)], ver: Long, merge: Boolean): Unit = {
    // a run only ever forms from segments that passed the landing
    // guard, so a part is either entirely fresh or an entirely
    // replayed segment — filter the latter on the markers
    val fresh = parts.filter { case (ids, _) =>
      ids.exists(k => t.lastTxn(s"$app.seg$k").isEmpty)
    }
    if (fresh.isEmpty) return
    val markers = fresh.flatMap(_._1).distinct
      .map(k => s"$app.seg$k" -> ver).toMap
    val df = s.read.parquet(fresh.map(_._2.toString).distinct: _*)
    if (merge) t.mergeInto(s, df, Some(app -> ver), markers)
    else t.appendInto(s, df, Some(app -> ver), markers)
  }

  /** Delete part dirs a fold has consumed (segment age-out — the
    * union read path only ever holds UNFOLDED parts). */
  def prune(parts: Seq[Path]): Unit =
    parts.distinct.foreach { p =>
      if (java.nio.file.Files.exists(p))
        PartitionedTable.deleteRecursively(p)
    }
}
