package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BloomMightContain
import graft.operators.BloomJoin

/** Bloom-prefiltered semi join (operators/BloomJoin.scala): the
  * prefilter must never change the answer (exact join drops false
  * positives), must never produce a false NEGATIVE (every true match
  * passes the filter), and must sit below the probe-side Exchange in
  * the plan — that placement is the entire point of the operator. */
class BloomJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("no false negatives: every build key passes its own filter") {
    import spark.implicits._
    val build = (1L to 1000L).map(i => i * 7919L).toDF("k")
    val bits = BloomJoin.buildBloom(build, "k", 0.01)
    val misses = build
      .filter(!BloomMightContain.mightContain(bits, col("k")))
      .count()
    assert(misses === 0L)
  }

  test("fpp holds: non-member pass rate is within 3x of the budget") {
    import spark.implicits._
    val build = (1L to 1000L).map(i => i * 7919L).toDF("k")
    val bits = BloomJoin.buildBloom(build, "k", 0.01)
    // disjoint probe set (odd offsets of a different stride)
    val probe = (1L to 20000L).map(i => i * 7919L + 3L).toDF("k")
    val passed = probe
      .filter(BloomMightContain.mightContain(bits, col("k")))
      .count()
    assert(passed.toDouble / 20000 <= 0.03, s"fp rate ${passed / 20000.0}")
  }

  test("semiJoinBloom equals the plain semi join") {
    val probe = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_quantity"))
    val build = Tables.orders(spark, d)
      .filter(col("o_totalprice") > 150000.0).select(col("o_orderkey"))
    val got = BloomJoin
      .semiJoinBloom(probe, build, "l_orderkey", "o_orderkey")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    val want = probe
      .join(build, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("NULL key is NULL (filtered), matching semi-join null semantics") {
    import spark.implicits._
    val build = Seq(1L, 2L).toDF("k")
    val bits = BloomJoin.buildBloom(build, "k", 0.01)
    val probe = Seq(Some(1L), None, Some(99L)).toDF("k")
    val rows = probe
      .select(BloomMightContain.mightContain(bits, col("k")).as("hit"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(rows(0) === true)
    assert(rows(1) === null)
  }

  test("prefilter sits below the probe-side Exchange") {
    // Tree printout order: a parent prints before its children, so the
    // probe-side Exchange line must precede the bloom Filter line, and
    // the filter must precede the probe scan it guards.
    val lines = BloomJoin.joinBloomPrefilter(spark, d)
      .queryExecution.executedPlan.toString.linesIterator.toVector
    val exchangeAt = lines.indexWhere(l =>
      l.contains("Exchange hashpartitioning(l_orderkey"))
    val bloomAt = lines.indexWhere(_.contains("bloom_might_contain"))
    val scanAt = lines.indexWhere(l =>
      l.contains("FileScan parquet") && l.contains("lineitem"))
    assert(exchangeAt >= 0, "expected a shuffled join shape (merge hint)")
    assert(bloomAt > exchangeAt,
      "bloom prefilter must be under the probe-side Exchange")
    assert(scanAt > bloomAt, "bloom prefilter must guard the probe scan")
  }

  test("SQL surface: bloom_might_contain over a hex binary literal") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    val build = Seq(10L, 20L).toDF("k")
    val bits = BloomJoin.buildBloom(build, "k", 0.01)
    val hex = bits.map(b => f"${b & 0xff}%02X").mkString
    spark.range(30).createOrReplaceTempView("bloom_probe_v")
    val n = spark.sql(
      s"SELECT count(*) AS n FROM bloom_probe_v WHERE bloom_might_contain(X'$hex', id)")
      .head().getLong(0)
    assert(n >= 2L && n <= 5L) // 10 and 20 + possible fps
    // strict type check: a STRING filter is an analysis error
    intercept[Exception] {
      spark.sql("SELECT bloom_might_contain('nope', 1L)").collect()
    }
  }
}
