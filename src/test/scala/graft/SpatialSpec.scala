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
}
