package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Retrieval
import graft.streaming.PartitionedTable

/** Mid-epoch fold REPLAY idempotence, structural form (r15 VERDICT
  * item 5): a fold commit records its sub-batch ids as txn markers
  * atomically with the data, so a replay of an already-FOLDED
  * sub-batch (AvailableNow re-delivering a micro-batch whose segment
  * a mid-epoch fold already consumed) is refused at the next fold —
  * final state identical to the no-replay run, however the loop
  * around the fold behaves. Pre-r16 this property was documented as
  * configurational (FoldPolicy.scala caveat, now deleted); this spec
  * makes it load-bearing. */
class FoldReplaySpec extends AnyFunSuite {
  private val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("replaying an already-folded sub-batch re-lands NOTHING (bm25 maintained index)") {
    val docs = Tables.documents(spark, d)
    val isArr = Retrieval.isArrival(col("doc_id"))
    val wd = java.nio.file.Files.createTempDirectory("graft_foldreplay")
    try {
      val idx = Retrieval.buildMaintained(spark, wd.resolve("idx"),
        docs.filter(!isArr))
      val segDir = wd.resolve("segs")
      java.nio.file.Files.createDirectories(segDir)
      val arrivals = docs.filter(isArr)
        .withColumn("sub_batch", Retrieval.arrivalSubBatch(col("doc_id")))
      def landSeg(k: Int): (Int, java.nio.file.Path) = {
        val batch = arrivals.filter(col("sub_batch") === k).drop("sub_batch")
        k -> Retrieval.writeSegment(segDir, k.toLong, Retrieval.postingsOf(batch))
      }
      def landDl(k: Int): (Int, java.nio.file.Path) = {
        val batch = arrivals.filter(col("sub_batch") === k).drop("sub_batch")
        k -> Retrieval.writeSegment(segDir.resolve("d"), k.toLong,
          Retrieval.doclensOf(batch))
      }

      // epoch: sub-batches 0 and 1 land, MID-EPOCH fold consumes them
      Retrieval.foldSegments(spark, idx,
        Seq(landSeg(0), landSeg(1)), Seq(landDl(0), landDl(1)), ver = 1L)
      val pRows = idx.postings.read(spark).count()
      val dRows = idx.doclens.read(spark).count()
      assert(idx.postings.lastTxn("bm25idx.seg0").contains(1L))
      assert(idx.postings.lastTxn("bm25idx.seg1").contains(1L))

      // REPLAY: the engine re-delivers sub-batch 0 — the loop (or a
      // buggy one) re-lands its segment and the close fold runs with
      // it AND the genuinely-new sub-batch 2
      Retrieval.foldSegments(spark, idx,
        Seq(landSeg(0), landSeg(2)), Seq(landDl(0), landDl(2)), ver = 2L)

      // sub-batch 0's rows appear exactly ONCE: the second fold landed
      // only sub-batch 2 (postings are append-only, so a re-land would
      // inflate the row count by |seg0|)
      val seg0Rows = Retrieval.postingsOf(
        arrivals.filter(col("sub_batch") === 0).drop("sub_batch")).count()
      val seg2Rows = Retrieval.postingsOf(
        arrivals.filter(col("sub_batch") === 2).drop("sub_batch")).count()
      assert(seg0Rows > 0 && seg2Rows > 0, "fixture needs non-empty sub-batches")
      assert(idx.postings.read(spark).count() === pRows + seg2Rows,
        "replayed sub-batch 0 must not re-land into the append-only postings")
      assert(idx.postings.lastTxn("bm25idx.seg2").contains(2L))

      // a PURE replay fold (every id already folded) commits nothing:
      // no new snapshot, txn versions unchanged
      val snapsBefore = idx.postings.snapshots
      Retrieval.foldSegments(spark, idx,
        Seq(landSeg(1), landSeg(2)), Seq(landDl(1), landDl(2)), ver = 3L)
      assert(idx.postings.snapshots === snapsBefore,
        "an all-replay fold must be a structural no-op")
      assert(idx.postings.lastTxn("bm25idx").contains(2L))

      // the maintained state equals the one-shot build over the same
      // docs (base + sub-batches 0..2, each exactly once)
      val served = Retrieval.serveMaintained(spark, idx,
        Retrieval.queryGramsOf(docs))
      val full = docs.filter(!isArr)
        .unionByName(arrivals.filter(col("sub_batch") <= 2).drop("sub_batch"))
      val oneShot = Retrieval.bm25TopkOf(full, Retrieval.QueryDocs)
      assert(served.collect().map(_.mkString("|")).toSet ===
        oneShot.collect().map(_.mkString("|")).toSet)
      val _ = dRows
    } finally PartitionedTable.deleteRecursively(wd)
  }

  test("tiered fold: serve equality holds at every level; the run carries its ids into the base markers") {
    val docs = Tables.documents(spark, d)
    val isArr = Retrieval.isArrival(col("doc_id"))
    val wd = java.nio.file.Files.createTempDirectory("graft_tieredfold")
    try {
      val idx = Retrieval.buildMaintained(spark, wd.resolve("idx"),
        docs.filter(!isArr))
      val segDir = wd.resolve("segs")
      java.nio.file.Files.createDirectories(segDir)
      val arrivals = docs.filter(isArr)
        .withColumn("sub_batch", Retrieval.arrivalSubBatch(col("doc_id")))
      def seg(k: Int, of: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
          sub: String): (Int, java.nio.file.Path) =
        k -> Retrieval.writeSegment(segDir.resolve(sub), k.toLong,
          of(arrivals.filter(col("sub_batch") === k).drop("sub_batch")))
      val qterms = Retrieval.queryGramsOf(docs)
      def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.collect().map(_.mkString("|")).toSet
      val oneShot = rowsOf(Retrieval.bm25TopkOf(
        docs.filter(!isArr).unionByName(arrivals.drop("sub_batch")),
        Retrieval.QueryDocs))

      // level 0: base ∪ three loose segments
      val p = (0 to 2).map(k => seg(k, Retrieval.postingsOf, "p"))
      val dl = (0 to 2).map(k => seg(k, Retrieval.doclensOf, "d"))
      assert(rowsOf(Retrieval.serveWithSegments(spark, idx,
        p.map(_._2), dl.map(_._2), qterms)) === oneShot)

      // level 1: segments 0,1 fold to a RUN — serve base ∪ run ∪ seg2
      val pRun = graft.streaming.LsmFold.mergeRun(spark, wd.resolve("pruns"), 0, p.take(2))
      val dRun = graft.streaming.LsmFold.mergeRun(spark, wd.resolve("druns"), 0, dl.take(2))
      assert(pRun._1.sorted === Seq(0, 1))
      assert(rowsOf(Retrieval.serveWithSegments(spark, idx,
        Seq(pRun._2, p(2)._2), Seq(dRun._2, dl(2)._2), qterms)) === oneShot)

      // level 2: run + loose seg2 fold to BASE in one commit; the
      // run's CONSTITUENT ids land as markers (the replay guard)
      graft.streaming.LsmFold.foldToBase(spark, idx.postings, "bm25idx",
        Seq(pRun, (Seq(2), p(2)._2)), 1L, merge = false)
      graft.streaming.LsmFold.foldToBase(spark, idx.doclens, "bm25dl",
        Seq(dRun, (Seq(2), dl(2)._2)), 1L, merge = true)
      (0 to 2).foreach { k =>
        assert(idx.postings.lastTxn(s"bm25idx.seg$k").contains(1L),
          s"run constituent $k must be marker-recorded at the base fold")
      }
      assert(rowsOf(Retrieval.serveMaintained(spark, idx, qterms)) === oneShot)

      // a replayed constituent (seg 0, folded via the run) is refused
      val before = idx.postings.read(spark).count()
      graft.streaming.LsmFold.foldToBase(spark, idx.postings, "bm25idx",
        Seq((Seq(0), seg(0, Retrieval.postingsOf, "p")._2)), 2L, merge = false)
      assert(idx.postings.read(spark).count() === before)
    } finally PartitionedTable.deleteRecursively(wd)
  }

  test("a crash between a fold's two commits loses no rows: the per-table guard re-lands only the missing table (r16 ADVICE)") {
    val docs = Tables.documents(spark, d)
    val isArr = Retrieval.isArrival(col("doc_id"))
    val wd = java.nio.file.Files.createTempDirectory("graft_halffold")
    try {
      val idx = Retrieval.buildMaintained(spark, wd.resolve("idx"),
        docs.filter(!isArr))
      val segDir = wd.resolve("segs")
      java.nio.file.Files.createDirectories(segDir)
      val arrivals = docs.filter(isArr)
      val pSeg = Retrieval.writeSegment(segDir, 0L, Retrieval.postingsOf(arrivals))
      val dSeg = Retrieval.writeSegment(segDir.resolve("d"), 0L,
        Retrieval.doclensOf(arrivals))
      val pRows0 = idx.postings.read(spark).count()
      val dRows0 = idx.doclens.read(spark).count()

      // the fold CRASHES in the window between its two commits:
      // doclens has landed sub-batch 0, postings has not
      intercept[RuntimeException] {
        Retrieval.foldPaired(spark, idx,
          Seq((Seq(0), pSeg)), Seq((Seq(0), dSeg)), ver = 1L,
          between = () => throw new RuntimeException("crash between commits"))
      }
      assert(idx.doclens.lastTxn("bm25dl.seg0").contains(1L))
      assert(idx.postings.lastTxn("bm25idx.seg0").isEmpty)
      val dRows1 = idx.doclens.read(spark).count()
      assert(dRows1 > dRows0, "fixture needs arrival docs")

      // RESTART + replay: the loop re-delivers sub-batch 0. The
      // per-table landing guard re-admits it (postings marker absent);
      // the next fold lands postings and REFUSES the already-folded
      // doclens part on its own markers — no loss, no duplication
      Retrieval.foldSegments(spark, idx,
        Seq(0 -> pSeg), Seq(0 -> dSeg), ver = 2L)
      assert(idx.postings.lastTxn("bm25idx.seg0").contains(2L))
      val segRows = spark.read.parquet(pSeg.toString).count()
      assert(idx.postings.read(spark).count() === pRows0 + segRows,
        "the recovery fold must land the postings exactly once")
      assert(idx.doclens.read(spark).count() === dRows1,
        "the already-folded doclens must not re-land (keyed merge would mask a dup; count pins it)")
      // the recovery postings commit re-stamps the pair marker to the
      // CURRENT doclens head — the pair a session resolves is whole
      assert(idx.postings.txnsAt(idx.postings.snapshots.last)
        .get(Retrieval.PairMarker).contains(idx.doclens.snapshots.last))

      // the recovered state answers exactly the one-shot build
      val served = Retrieval.serveMaintained(spark, idx,
        Retrieval.queryGramsOf(docs))
      val oneShot = Retrieval.bm25TopkOf(
        docs.filter(!isArr).unionByName(arrivals), Retrieval.QueryDocs)
      assert(served.collect().map(_.mkString("|")).toSet ===
        oneShot.collect().map(_.mkString("|")).toSet)
    } finally PartitionedTable.deleteRecursively(wd)
  }

  test("foldToBase refuses a MIXED part (some ids folded, some not) instead of silently duplicating the folded rows") {
    val docs = Tables.documents(spark, d)
    val isArr = Retrieval.isArrival(col("doc_id"))
    val wd = java.nio.file.Files.createTempDirectory("graft_mixedpart")
    try {
      val idx = Retrieval.buildMaintained(spark, wd.resolve("idx"),
        docs.filter(!isArr))
      val segDir = wd.resolve("segs")
      java.nio.file.Files.createDirectories(segDir)
      val arrivals = docs.filter(isArr)
        .withColumn("sub_batch", Retrieval.arrivalSubBatch(col("doc_id")))
      def seg(k: Int): (Int, java.nio.file.Path) =
        k -> Retrieval.writeSegment(segDir, k.toLong, Retrieval.postingsOf(
          arrivals.filter(col("sub_batch") === k).drop("sub_batch")))
      // sub-batch 0 folds to base; a (buggy) run then forms from
      // segments 0 AND 1 — re-landing it would duplicate 0's rows
      graft.streaming.LsmFold.foldToBase(spark, idx.postings, "bm25idx",
        Seq((Seq(0), seg(0)._2)), 1L, merge = false)
      val mixedRun = graft.streaming.LsmFold.mergeRun(spark,
        wd.resolve("runs"), 0, Seq(seg(0), seg(1)))
      val before = idx.postings.read(spark).count()
      val ex = intercept[IllegalArgumentException] {
        graft.streaming.LsmFold.foldToBase(spark, idx.postings, "bm25idx",
          Seq(mixedRun), 2L, merge = false)
      }
      assert(ex.getMessage.contains("mixed part"))
      assert(idx.postings.read(spark).count() === before,
        "the refused fold must not have landed anything")
    } finally PartitionedTable.deleteRecursively(wd)
  }

  test("replay markers guard the ANN maintained table's fold path too") {
    val e = Tables.embeddings(spark, d)
    val wd = java.nio.file.Files.createTempDirectory("graft_foldreplay_ann")
    try {
      val pt = new PartitionedTable(wd.resolve("idx"), "cell", 4)
      import spark.implicits._
      def seg(k: Int): String = {
        val p = wd.resolve(f"seg$k%04d")
        e.filter(col("vec_id") % 3 === k).select(col("vec_id"),
          (col("vec_id") % 7).as("cell"), lit(1.0).as("c_scale"),
          array(lit(1L)).as("cq"))
          .write.mode("overwrite").parquet(p.toString)
        p.toString
      }
      pt.appendInto(spark, spark.read.parquet(seg(0)), Some("annidx" -> 1L),
        Map("annidx.seg0" -> 1L))
      val n0 = pt.read(spark).count()
      // the guard the loop's fold closure applies: seg0 is filtered out
      val live = Seq(0 -> seg(0), 1 -> seg(1))
        .filterNot { case (k, _) => pt.lastTxn(s"annidx.seg$k").isDefined }
      assert(live.map(_._1) === Seq(1))
      pt.appendInto(spark, spark.read.parquet(live.map(_._2): _*),
        Some("annidx" -> 2L),
        live.map { case (k, _) => s"annidx.seg$k" -> 2L }.toMap)
      val seg1Rows = spark.read.parquet(seg(1)).count()
      assert(pt.read(spark).count() === n0 + seg1Rows)
      assert(pt.lastTxn("annidx.seg0").contains(1L))
      assert(pt.lastTxn("annidx.seg1").contains(2L))
    } finally PartitionedTable.deleteRecursively(wd)
  }
}
