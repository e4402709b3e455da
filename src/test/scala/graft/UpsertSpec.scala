package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.nio.file.Files
import graft.operators.Upsert
import graft.streaming.Replication
import graft.streaming.Replication.VersionedTable

/** Upsert/merge + replication invariants. The central safety property
  * is the reference's own (README.md:59): re-applying a diff "will
  * just update the data to its current state again" — idempotence of
  * merge, checked here as a ScalaCheck property over generated
  * changelogs. */
class UpsertSpec extends AnyFunSuite {

  /** Deterministic property driver: n samples from a seeded Gen. */
  private def forSamples[A](gen: Gen[A], n: Int = 15)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def sameRows(a0: DataFrame, b0: DataFrame): Boolean = {
    // MapType columns are not set-op comparable: stringify them
    def norm(df: DataFrame): DataFrame =
      df.schema.fields.foldLeft(df) {
        case (d, f) if f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] =>
          d.withColumn(f.name, to_json(col(f.name)))
        case (d, _) => d
      }
    val (a, b) = (norm(a0), norm(b0))
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
  }

  private val changelogGen = for {
    n <- Gen.chooseNum(0, 40)
    rows <- Gen.listOfN(n, for {
      id <- Gen.chooseNum(1L, 10L)
      seq <- Gen.chooseNum(1L, 20L)
      v <- Gen.alphaLowerStr.map(_.take(6))
    } yield (id, seq, v))
  } yield rows

  test("merge is idempotent: apply(apply(s,d),d) == apply(s,d)") {
    forSamples(Gen.zip(changelogGen, changelogGen), n = 10) { case (base, diff) =>
      val s0 = Upsert.lastWins(base.toDF("id", "seq", "v"), Seq("id"), Seq(col("seq"), col("v")))
      val d0 = Upsert.lastWins(diff.toDF("id", "seq", "v"), Seq("id"), Seq(col("seq"), col("v")))
      val once = Upsert.merge(s0, d0, Seq("id"))
      val twice = Upsert.merge(once, d0, Seq("id"))
      assert(sameRows(once, twice))
    }
  }

  test("merge keys are unique and updates win") {
    val base = Seq((1L, "old"), (2L, "keep")).toDF("id", "v")
    val upd = Seq((1L, "new"), (3L, "ins")).toDF("id", "v")
    val m = Upsert.merge(base, upd, Seq("id"))
    assert(m.count() === 3)
    assert(m.filter($"id" === 1).select("v").head().getString(0) === "new")
    assert(m.filter($"id" === 2).select("v").head().getString(0) === "keep")
  }

  test("lastWins picks highest ordering per key, deterministically") {
    val df = Seq((1L, 1L, "a"), (1L, 3L, "c"), (1L, 2L, "b"), (2L, 1L, "x"))
      .toDF("id", "seq", "v")
    val got = Upsert.lastWins(df, Seq("id"), Seq(col("seq")))
      .orderBy("id").select("v").collect().map(_.getString(0)).toSeq
    assert(got === Seq("c", "x"))
  }

  test("sequencePath matches the nnn/nnn/nnn addressing (changesetmd.py:127-135)") {
    assert(Replication.sequencePath(1612345L) === "001/612/345.osm.gz")
    assert(Replication.sequencePath(7L) === "000/000/007.osm.gz")
  }

  test("catchUp applies all diffs once, is a no-op when caught up, and replay is idempotent") {
    val root = Files.createTempDirectory("graft_t_repl")
    val base = root.resolve("repl")
    val table = root.resolve("tables/cs")
    val state = root.resolve("state.txt")
    Replication.writeFixtureWorld(base, 4)
    Replication.StateDoc.write(state,
      Replication.ReplState(0L, None, updateInProgress = false))

    assert(Replication.catchUp(spark, base, table, state, batchSize = 3) === 4)
    val after = VersionedTable.read(spark, table).cache()
    assert(after.filter($"id" === 11).select("num_changes").head().getInt(0) === 4)

    // caught up -> no work
    assert(Replication.catchUp(spark, base, table, state) === 0)

    // deliberate rewind (README.md:58-59): re-apply everything
    Replication.StateDoc.write(state,
      Replication.ReplState(0L, None, updateInProgress = false))
    assert(Replication.catchUp(spark, base, table, state, batchSize = 2) === 4)
    assert(sameRows(after, VersionedTable.read(spark, table)))
  }

  test("failure isolation: missing diff aborts the run, lock released, offset not advanced past applied batches (changesetmd.py:165-195)") {
    val root = Files.createTempDirectory("graft_t_fail")
    val base = root.resolve("repl")
    val table = root.resolve("tables/cs")
    val state = root.resolve("state.txt")
    Replication.writeFixtureWorld(base, 4)
    // sabotage: delete diff #3 so the second batch fails mid-run
    Files.delete(base.resolve(Replication.sequencePath(3L)))
    Replication.StateDoc.write(state,
      Replication.ReplState(0L, None, updateInProgress = false))
    intercept[Exception] {
      Replication.catchUp(spark, base, table, state, batchSize = 2)
    }
    // batch 1 (diffs 1-2) committed before the failure; offset reflects it
    assert(Replication.StateDoc.read(state).lastSequence === 2L)
    // lock must be released: a repaired rerun succeeds and catches up
    graft.sources.OsmXml.writeFixture(base.resolve(Replication.sequencePath(3L)),
      graft.sources.OsmXml.diffFixture(3L))
    assert(Replication.catchUp(spark, base, table, state, batchSize = 2) === 2)
    assert(Replication.StateDoc.read(state).lastSequence === 4L)
  }

  test("writer lock refuses concurrent catch-up (changesetmd.py:138-160)") {
    val dir = Files.createTempDirectory("graft_t_lock")
    Replication.withWriterLock(dir) {
      intercept[IllegalStateException] {
        Replication.withWriterLock(dir) { fail("second writer entered") }
      }
    }
    // released after the block: can lock again
    Replication.withWriterLock(dir) {}
  }

  test("state doc roundtrip incl. the (-1, null, 0) init sentinel (queries.py:35)") {
    val p = Files.createTempDirectory("graft_t_state").resolve("s.txt")
    Replication.StateDoc.init(p)
    assert(Replication.StateDoc.read(p) ===
      Replication.ReplState(-1L, None, updateInProgress = false))
    val st = Replication.ReplState(42L, Some("2015-11-16T12:00:00Z"), updateInProgress = true)
    Replication.StateDoc.write(p, st)
    assert(Replication.StateDoc.read(p) === st)
  }
}
