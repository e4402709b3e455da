package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Spatial
import graft.plans.BandJoinRule

/** BandJoinRule: the point-in-interval theta join must block on
  * fixed-width cells when a width is configured, match vanilla
  * planning exactly, and back off when unconfigured or already
  * hash-joinable. */
class BandRuleSpec extends AnyFunSuite {
  private lazy val s = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  private def withRule[T](width: String = "256", skip: String = "0")(f: => T): T = {
    BandJoinRule.install(s)
    val keys = Seq(BandJoinRule.CellWidthKey, BandJoinRule.SkipBytesKey)
    val prev = keys.map(k => k -> s.conf.getOption(k)).toMap
    s.conf.set(BandJoinRule.CellWidthKey, width)
    s.conf.set(BandJoinRule.SkipBytesKey, skip)
    try f
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  private def naive(): DataFrame =
    Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      .join(Spatial.priceBands(s, d),
        col("o_totalprice") >= col("band_lo") && col("o_totalprice") <= col("band_hi"))
      .select(col("o_orderkey"), col("c_custkey"))

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rewrite fires: cell columns present, no nested loop") {
    withRule() {
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val p = physical(naive())
        assert(p.contains("graft_pcell") && p.contains("graft_bcell"), p)
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("rewritten results match vanilla planning exactly") {
    val vanilla = naive().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val rewritten = withRule() {
      naive().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(rewritten.nonEmpty && (rewritten sameElements vanilla))
  }

  test("gate query equals vanilla aggregation") {
    val auto = Spatial.joinBandAuto(s, d).orderBy("c_custkey").collect().toSeq
    val hand = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      .join(Spatial.priceBands(s, d),
        col("o_totalprice") >= col("band_lo") && col("o_totalprice") <= col("band_hi"))
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_hits"), min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("c_custkey").collect().toSeq
    assert(auto.nonEmpty && auto == hand)
  }

  test("point side on the right works too") {
    import s.implicits._
    val bands = Seq((1L, 0.0, 10.0), (2L, 20.0, 30.0)).toDF("bid", "lo", "hi")
    val pts = Seq((10L, 5.0), (11L, 25.0), (12L, 15.0)).toDF("pid", "v")
    def joined = bands.join(pts, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("bid", "pid")
    val vanilla = joined.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val rewritten = withRule(width = "8") {
      val p = physical(joined)
      assert(p.contains("graft_pcell"), p)
      joined.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(vanilla.toSeq == Seq((1L, 10L), (2L, 11L)) && (rewritten sameElements vanilla))
  }

  test("backs off: no cell width configured") {
    BandJoinRule.install(s)
    val prev = s.conf.getOption(BandJoinRule.CellWidthKey)
    prev.foreach(_ => s.conf.unset(BandJoinRule.CellWidthKey))
    try assert(!physical(naive()).contains("graft_pcell"))
    finally prev.foreach(v => s.conf.set(BandJoinRule.CellWidthKey, v))
  }

  test("backs off: cross-side equality conjunct present") {
    withRule() {
      val df = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .join(Spatial.priceBands(s, d),
          col("o_custkey") === col("c_custkey") &&
          col("o_totalprice") >= col("band_lo") && col("o_totalprice") <= col("band_hi"))
      assert(!physical(df).contains("graft_pcell"))
    }
  }
}
