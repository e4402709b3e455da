package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{BandJoinRule, GridBboxJoinRule}

/** Adversarial equivalence fuzz for the two optimizer rewrites: on
  * randomized geometry — negative coordinates, zero-width boxes,
  * degenerate min>max intervals, values exactly on cell boundaries,
  * huge and tiny magnitudes — the rewritten join must return exactly
  * the vanilla pair set, and the SQL surface must rewrite the same
  * as the DataFrame surface. */
class JoinRuleFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def withConfs[T](confs: Map[String, String])(f: => T): T = {
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // Coordinates adversarial to the grid: boundary multiples of the
  // cell size, offsets epsilon away from them, negatives, and a few
  // large magnitudes.
  private val coordGen: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-180.0, 180.0),
    Gen.chooseNum(-45, 45).map(_ * 4.0),            // exact cell bounds (g=4)
    Gen.chooseNum(-45, 45).map(_ * 4.0 + 1e-9),
    Gen.chooseNum(-45, 45).map(_ * 4.0 - 1e-9),
    Gen.const(0.0), Gen.const(-0.0),
    Gen.chooseNum(-1e6, 1e6))

  private def boxes(n: Int, seed: Long): Seq[(Long, Double, Double, Double, Double)] = {
    val g = for {
      x1 <- coordGen; y1 <- coordGen
      w <- Gen.oneOf(Gen.const(0.0), Gen.chooseNum(0.0, 12.0), Gen.chooseNum(-6.0, 6.0))
      h <- Gen.oneOf(Gen.const(0.0), Gen.chooseNum(0.0, 12.0), Gen.chooseNum(-6.0, 6.0))
    } yield (x1, y1, x1 + w, y1 + h) // w/h may be negative: degenerate boxes
    (0 until n).map { i =>
      val (x1, y1, x2, y2) = g.apply(Gen.Parameters.default, Seed(seed + i)).get
      (i.toLong, x1, y1, x2, y2)
    }
  }

  test("GridBboxJoinRule: rewritten pair set equals vanilla on adversarial boxes") {
    val s = spark; import s.implicits._
    GridBboxJoinRule.install(spark)
    (1 to 3).foreach { round =>
      val l = boxes(160, 1000L * round)
        .toDF("lid", "min_lon", "min_lat", "max_lon", "max_lat")
      val r = boxes(160, 2000L * round)
        .toDF("rid", "c_min_lon", "c_min_lat", "c_max_lon", "c_max_lat")
      def joined = l.join(r,
        col("min_lon") <= col("c_max_lon") && col("max_lon") >= col("c_min_lon") &&
        col("min_lat") <= col("c_max_lat") && col("max_lat") >= col("c_min_lat"))
        .select("lid", "rid")
      val vanilla = joined.collect().map(x => (x.getLong(0), x.getLong(1))).sorted
      val rewritten = withConfs(Map(GridBboxJoinRule.SkipBytesKey -> "0")) {
        assert(joined.queryExecution.executedPlan.toString.contains("graft_cx"))
        joined.collect().map(x => (x.getLong(0), x.getLong(1))).sorted
      }
      assert(rewritten sameElements vanilla,
        s"round $round: ${vanilla.length} vanilla vs ${rewritten.length} rewritten pairs")
      assert(vanilla.nonEmpty, s"round $round produced no pairs - weak fixture")
    }
  }

  test("GridBboxJoinRule 1-D: interval-overlap pair set equals vanilla") {
    val s = spark; import s.implicits._
    GridBboxJoinRule.install(spark)
    (1 to 3).foreach { round =>
      val l = boxes(160, 5000L * round)
        .map { case (i, x1, _, x2, _) => (i, x1, x2) } // may be inverted
        .toDF("lid", "session_start", "session_end")
      val r = boxes(160, 6000L * round)
        .map { case (i, x1, _, x2, _) => (i, x1, x2) }
        .toDF("rid", "w_start", "w_end")
      def joined = l.join(r,
        col("session_start") <= col("w_end") && col("w_start") <= col("session_end"))
        .select("lid", "rid")
      val vanilla = joined.collect().map(x => (x.getLong(0), x.getLong(1))).sorted
      val rewritten = withConfs(Map(GridBboxJoinRule.SkipBytesKey -> "0")) {
        val p = joined.queryExecution.executedPlan.toString
        assert(p.contains("graft_cx") && !p.contains("graft_cy"), p)
        joined.collect().map(x => (x.getLong(0), x.getLong(1))).sorted
      }
      assert(rewritten sameElements vanilla,
        s"round $round: ${vanilla.length} vanilla vs ${rewritten.length} rewritten pairs")
      assert(vanilla.nonEmpty, s"round $round produced no pairs - weak fixture")
    }
  }

  test("BandJoinRule: rewritten pair set equals vanilla on adversarial intervals") {
    val s = spark; import s.implicits._
    BandJoinRule.install(spark)
    (1 to 3).foreach { round =>
      val bands = boxes(160, 3000L * round)
        .map { case (i, x1, _, x2, _) => (i, x1, x2) } // may be inverted
        .toDF("bid", "lo", "hi")
      val pts = boxes(160, 4000L * round)
        .map { case (i, x1, _, _, _) => (i, x1) }
        .toDF("pid", "v")
      def joined = pts.join(bands, col("v") >= col("lo") && col("v") <= col("hi"))
        .select("pid", "bid")
      val vanilla = joined.collect().map(x => (x.getLong(0), x.getLong(1))).sorted
      val rewritten = withConfs(Map(
        BandJoinRule.SkipBytesKey -> "0", BandJoinRule.CellWidthKey -> "4")) {
        assert(joined.queryExecution.executedPlan.toString.contains("graft_pcell"))
        joined.collect().map(x => (x.getLong(0), x.getLong(1))).sorted
      }
      assert(rewritten sameElements vanilla,
        s"round $round: ${vanilla.length} vanilla vs ${rewritten.length} rewritten pairs")
      assert(vanilla.nonEmpty, s"round $round produced no pairs - weak fixture")
    }
  }

  test("SQL surface rewrites identically to the DataFrame surface") {
    val s = spark; import s.implicits._
    GridBboxJoinRule.install(spark)
    boxes(120, 7L).toDF("lid", "min_lon", "min_lat", "max_lon", "max_lat")
      .createOrReplaceTempView("fuzz_l")
    boxes(120, 11L).toDF("rid", "c_min_lon", "c_min_lat", "c_max_lon", "c_max_lat")
      .createOrReplaceTempView("fuzz_r")
    try {
      // def: a DataFrame caches its QueryExecution, so each probe must
      // re-plan under the conf in force
      def sql = spark.sql(
        """SELECT lid, rid FROM fuzz_l JOIN fuzz_r
          |ON min_lon <= c_max_lon AND max_lon >= c_min_lon
          |  AND min_lat <= c_max_lat AND max_lat >= c_min_lat""".stripMargin)
      val vanilla = sql.collect().map(x => (x.getLong(0), x.getLong(1))).sorted
      val rewritten = withConfs(Map(GridBboxJoinRule.SkipBytesKey -> "0")) {
        assert(sql.queryExecution.executedPlan.toString.contains("graft_cx"),
          "the rule must fire on spark.sql() plans too")
        sql.collect().map(x => (x.getLong(0), x.getLong(1))).sorted
      }
      assert(vanilla.nonEmpty && (rewritten sameElements vanilla))
    } finally {
      spark.catalog.dropTempView("fuzz_l")
      spark.catalog.dropTempView("fuzz_r")
    }
  }

  test("timestamp axes: session-overlap and event-in-session rewrite and match vanilla") {
    val s = spark; import s.implicits._
    GridBboxJoinRule.install(spark)
    BandJoinRule.install(spark)
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // sessions: [start, start+len); windows shifted/overlapping
    val sessions = (0L until 200L)
      .map(i => (i, ts(1700000000L + i * 37), ts(1700000000L + i * 37 + 25 + (i % 90))))
      .toDF("sid", "session_start", "session_end")
    val windows = (0L until 200L)
      .map(i => (i + 1000, ts(1700000000L + i * 41 + 5), ts(1700000000L + i * 41 + 40)))
      .toDF("wid", "w_start", "w_end")
    val events = (0L until 400L)
      .map(i => (i + 5000, ts(1700000000L + i * 19 + 3)))
      .toDF("eid", "ev_ts")

    def overlap = sessions.join(windows,
      col("session_start") <= col("w_end") && col("w_start") <= col("session_end"))
      .select("sid", "wid")
    val ovVanilla = overlap.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val ovRewritten = withConfs(Map(GridBboxJoinRule.SkipBytesKey -> "0",
        GridBboxJoinRule.CellDegKey -> "64")) {
      val p = overlap.queryExecution.executedPlan.toString
      assert(p.contains("graft_cx") && !p.contains("graft_cy"), p)
      overlap.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(ovVanilla.nonEmpty && (ovRewritten sameElements ovVanilla))

    def inSession = events.join(sessions,
      col("ev_ts") >= col("session_start") && col("ev_ts") <= col("session_end"))
      .select("eid", "sid")
    val inVanilla = inSession.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val inRewritten = withConfs(Map(BandJoinRule.SkipBytesKey -> "0",
        BandJoinRule.CellWidthKey -> "64")) {
      val p = inSession.queryExecution.executedPlan.toString
      assert(p.contains("graft_pcell"), p)
      inSession.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(inVanilla.nonEmpty && (inRewritten sameElements inVanilla))
  }
}
