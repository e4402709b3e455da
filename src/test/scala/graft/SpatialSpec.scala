package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Spatial

/** Grid-cell box×box join: the candidate-then-verify spatial-join
  * shape must be LOSSLESS — identical to the direct theta join. */
class SpatialSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("grid-cell join equals the direct theta join (lossless candidates)") {
    val d = "/root/testdata/sf0.001"
    val viaGrid = Spatial.joinBboxGrid(spark, d)
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    val a = Spatial.ordersBbox(spark, d)
    val b = Spatial.customerBbox(spark, d)
    val direct = a.join(b,
        col("min_lon") <= col("c_max_lon") && col("max_lon") >= col("c_min_lon") &&
        col("min_lat") <= col("c_max_lat") && col("max_lat") >= col("c_min_lat"))
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_overlaps"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    assert(viaGrid === direct)
    assert(viaGrid.nonEmpty)
    // both physical forms, several grid sizes: same result as direct
    for (g <- Seq(2.0, 4.0, 8.0)) {
      val decl = Spatial.joinBboxGridG(spark, d, g)
        .orderBy("c_custkey").collect().map(_.toSeq).toSeq
      val kern = Spatial.joinBboxGridLocalG(spark, d, g)
        .orderBy("c_custkey").collect().map(_.toSeq).toSeq
      assert(decl === direct, s"declarative g=$g diverges")
      assert(kern === direct, s"local kernel g=$g diverges")
    }
  }

  test("grid chooser: multiplicity-aware optimum near the box scale, coarser when tiny") {
    import graft.operators.Spatial.{BoxStats, chooseGrid, expectedCandidates, isPow2}
    // sf1-shaped stats: ~4x3 and 5x4 degree boxes over a 346x164 domain
    val a = BoxStats(1500000L, 4.0, 3.0, 346.0, 164.0)
    val b = BoxStats(150000L, 5.0, 4.0, 348.0, 166.0)
    val g = chooseGrid(a, b)
    assert(g === 4.0) // measured fastest at sf1 (8.0s vs 11.0s at g=2, 34s at g=1)
    // model reproduces the measured candidate count at g=4 (1.02e9 +-5%)
    val c4 = expectedCandidates(a, b, 4.0)
    assert(c4 > 0.95e9 && c4 < 1.1e9, s"model says $c4")
    // same shapes, tiny corpus: explode overhead dominates -> coarser pick
    val g0 = chooseGrid(a.copy(n = 15000L), b.copy(n = 1500L))
    assert(g0 >= 4.0)
    assert(graft.operators.Spatial.GridCandidates.contains(g))
    assert(graft.operators.Spatial.GridCandidates.forall(isPow2))
    assert(!isPow2(5.0) && isPow2(0.5) && isPow2(16.0))
  }

  test("boundary-touching boxes share a cell (closed-interval contract)") {
    import spark.implicits._
    // [10,20]x[0,5] touches [20,30]x[0,5] exactly on the lon=20 edge:
    // the closed-interval predicate counts it, and the cell ranges
    // share cx=2 — the grid must not lose the touching pair
    val av = Seq((1L, 10.0, 0.0, 20.0, 5.0))
      .toDF("o_orderkey", "min_lon", "min_lat", "max_lon", "max_lat")
    val bv = Seq((7L, 20.0, 0.0, 30.0, 5.0))
      .toDF("c_custkey", "c_min_lon", "c_min_lat", "c_max_lon", "c_max_lat")
    val cellsA = av.withColumn("cx", explode(sequence(
        floor(col("min_lon") / Spatial.GridDeg).cast("int"),
        floor(col("max_lon") / Spatial.GridDeg).cast("int"))))
    val cellsB = bv.withColumn("cx", explode(sequence(
        floor(col("c_min_lon") / Spatial.GridDeg).cast("int"),
        floor(col("c_max_lon") / Spatial.GridDeg).cast("int"))))
    val shared = cellsA.join(cellsB, Seq("cx")).count()
    assert(shared >= 1)
  }

  test("clustered geometry: hot-cell sub-split keeps the kernel exact and bounded") {
    val d = "/root/testdata/sf0.001"
    // sf0.001 at g=16: every box lives in a handful of cells; forcing
    // the side limit to 32 makes EVERY populated cell tile (the
    // all-in-one-metro-cell shape), so the sub-split path is exercised
    // on real data and must stay pair-exact vs the declarative form
    val decl = Spatial.joinBboxGridG(spark, d, 16.0)
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.bbox.subSplitLimit", "32")
    try {
      val split = Spatial.joinBboxGridLocalG(spark, d, 16.0)
        .orderBy("c_custkey").collect().map(_.toSeq).toSeq
      assert(split === decl)
      assert(split.nonEmpty)
    } finally spark.conf.unset("spark.graft.bbox.subSplitLimit")
  }

  test("top-overlap kernel equals the direct theta-join argmax") {
    val d = "/root/testdata/sf0.001"
    val viaKernel = Spatial.joinBboxTopOverlap(spark, d)
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    val a = Spatial.ordersBbox(spark, d)
    val b = Spatial.customerBbox(spark, d)
    val area = (least(col("max_lon"), col("c_max_lon")) - greatest(col("min_lon"), col("c_min_lon"))) *
      (least(col("max_lat"), col("c_max_lat")) - greatest(col("min_lat"), col("c_min_lat")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_custkey"))
      .orderBy(col("overlap_area").desc, col("o_orderkey").asc)
    val direct = a.join(b,
        col("min_lon") <= col("c_max_lon") && col("max_lon") >= col("c_min_lon") &&
        col("min_lat") <= col("c_max_lat") && col("max_lat") >= col("c_min_lat"))
      .select(col("c_custkey"), col("o_orderkey"), area.as("overlap_area"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("c_custkey"), col("o_orderkey"), col("overlap_area"))
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    assert(viaKernel === direct)
    assert(viaKernel.nonEmpty)
  }

  test("boxStats on an empty input yields degenerate stats, not NULL throws") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double, Double, Double, Double)]
      .toDF("o_orderkey", "min_lon", "min_lat", "max_lon", "max_lat")
    val st = Spatial.boxStats(empty, "min_lon", "max_lon", "min_lat", "max_lat")
    assert(st.n === 0L)
    assert(st.lonExt > 0.0 && st.latExt > 0.0) // extents stay positive for the cost model
    // and the grid chooser still returns a valid candidate
    assert(Spatial.GridCandidates.contains(
      graft.operators.Spatial.chooseGrid(st, st)))
  }
}
