package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Spatial
import graft.plans.GridBboxJoinRule

/** The optimizer-planned spatial join: GridBboxJoinRule must turn the
  * naive overlap theta join into the grid equi-join (no nested-loop
  * node, cells in the plan), produce results identical to vanilla
  * planning, and back off in every case where rewriting would be
  * wrong or unwanted. */
class GridRuleSpec extends AnyFunSuite {
  private lazy val s = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  private def withRule[T](skipBytes: String = "0")(f: => T): T = {
    GridBboxJoinRule.install(s)
    val prev = s.conf.getOption(GridBboxJoinRule.SkipBytesKey)
    s.conf.set(GridBboxJoinRule.SkipBytesKey, skipBytes)
    try f
    finally prev match {
      case Some(v) => s.conf.set(GridBboxJoinRule.SkipBytesKey, v)
      case None    => s.conf.unset(GridBboxJoinRule.SkipBytesKey)
    }
  }

  private def naiveOverlap(): DataFrame =
    Spatial.ordersBbox(s, d).join(Spatial.customerBbox(s, d),
      col("min_lon") <= col("c_max_lon") && col("max_lon") >= col("c_min_lon") &&
      col("min_lat") <= col("c_max_lat") && col("max_lat") >= col("c_min_lat"))

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rewrite fires: no nested-loop join, grid cells in the plan") {
    withRule() {
      val p = physical(naiveOverlap())
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"expected the grid rewrite, got:\n$p")
      assert(p.contains("graft_cx") && p.contains("graft_cy"), p)
    }
  }

  test("rewritten results match vanilla planning exactly") {
    val vanilla = naiveOverlap().select(col("o_orderkey"), col("c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val rewritten = withRule() {
      naiveOverlap().select(col("o_orderkey"), col("c_custkey"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(rewritten.nonEmpty && (rewritten sameElements vanilla))
  }

  test("gate query equals the hand-built grid form") {
    val auto = Spatial.joinBboxAuto(s, d).orderBy("c_custkey").collect().toSeq
    val hand = Spatial.joinBboxGridG(s, d, Spatial.GridDeg)
      .orderBy("c_custkey").collect().toSeq
    assert(auto == hand)
  }

  test("degenerate min>max boxes: rewrite is still lossless") {
    import s.implicits._
    // left box 10 on axis x is inverted ([8,2]) but still satisfies the
    // overlap conjuncts against right [0,20]x[0,20].
    val l = Seq((10L, 8.0, 2.0, 1.0, 3.0), (11L, 30.0, 34.0, 1.0, 3.0))
      .toDF("lid", "min_x", "max_x", "min_y", "max_y")
    val r = Seq((20L, 0.0, 20.0, 0.0, 20.0))
      .toDF("rid", "c_min_x", "c_max_x", "c_min_y", "c_max_y")
    def joined = l.join(r,
      col("min_x") <= col("c_max_x") && col("max_x") >= col("c_min_x") &&
      col("min_y") <= col("c_max_y") && col("max_y") >= col("c_min_y"))
      .select("lid", "rid")
    val vanilla = joined.collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    val rewritten = withRule() {
      val p = physical(joined)
      assert(p.contains("graft_cx"), p)
      joined.collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    }
    assert(vanilla.toSeq == Seq((10L, 20L)) && (rewritten sameElements vanilla))
  }

  test("backs off: cross-side equality conjunct present") {
    withRule() {
      val df = Spatial.ordersBbox(s, d).join(Spatial.customerBbox(s, d),
        col("o_custkey") === col("c_custkey") &&
        col("min_lon") <= col("c_max_lon") && col("max_lon") >= col("c_min_lon") &&
        col("min_lat") <= col("c_max_lat") && col("max_lat") >= col("c_min_lat"))
      assert(!physical(df).contains("graft_cx"))
    }
  }

  test("backs off: small side under the broadcast-skip threshold") {
    withRule(skipBytes = (10L << 20).toString) {
      // both sf0.001 sides are far under 10 MB -> keep Spark's plan
      assert(!physical(naiveOverlap()).contains("graft_cx"))
    }
  }

  test("backs off: ambiguous axis pairing is never guessed") {
    import s.implicits._
    // `u_min`/`u_lo` and `u_max`/`u_hi` all stem to `u` (likewise the
    // right side), so both axes collapse to ONE stem key: two A and
    // two B conjunct candidates with no safe pairing -> no rewrite.
    val l = Seq((1L, 1.0, 5.0, 1.0, 5.0)).toDF("lid", "u_min", "u_max", "u_lo", "u_hi")
    val r = Seq((2L, 0.0, 9.0, 0.0, 9.0)).toDF("rid", "c_u_min", "c_u_max", "c_u_lo", "c_u_hi")
    withRule() {
      val df = l.join(r,
        col("u_min") <= col("c_u_max") && col("c_u_min") <= col("u_max") &&
        col("u_lo") <= col("c_u_hi") && col("c_u_lo") <= col("u_hi"))
      assert(!physical(df).contains("graft_cx"))
      assert(df.count() == 1)
    }
  }

  test("1-D interval overlap joins rewrite too") {
    import s.implicits._
    val l = Seq((1L, 0.0, 10.0), (2L, 50.0, 55.0), (3L, 9.0, 3.0))
      .toDF("lid", "session_start", "session_end") // (3) is degenerate
    val r = Seq((20L, 8.0, 12.0), (21L, 60.0, 70.0), (22L, 2.5, 9.5))
      .toDF("rid", "w_start", "w_end")
    def joined = l.join(r,
      col("session_start") <= col("w_end") && col("w_start") <= col("session_end"))
      .select("lid", "rid")
    val vanilla = joined.collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    val rewritten = withRule() {
      val p = physical(joined)
      assert(p.contains("graft_cx") && !p.contains("graft_cy"), p)
      joined.collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    }
    assert(vanilla.toSeq == Seq((1L, 20L), (1L, 22L), (3L, 22L)) &&
      (rewritten sameElements vanilla))
  }

  test("backs off: disabled by conf") {
    withRule() {
      s.conf.set(GridBboxJoinRule.EnabledKey, "false")
      try assert(!physical(naiveOverlap()).contains("graft_cx"))
      finally s.conf.unset(GridBboxJoinRule.EnabledKey)
    }
  }
}
