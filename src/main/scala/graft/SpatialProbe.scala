package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Spatial

/** Scratch diagnostic for join_bbox_grid scaling (not part of the
  * library surface): times the REAL grid join (`Spatial.joinBboxGridG`)
  * at several cell sizes and prints exploded-row / candidate counts.
  *
  * sf1 findings it produced (recorded in SCALING.md "Spatial joins"):
  * true intersecting pairs grow 32k (sf0.1) → 322.8M (sf1) because the
  * ScaleGen key-shifts decorrelate the synthetic lon/lat congruences —
  * the query is OUTPUT-bound there (≈80M candidate-evals/sec on 32
  * cores, 3.3:1 candidate:true ratio at g=5), not plan-bound.
  */
object SpatialProbe {

  /** Candidate pairs before the exact-predicate verify (cell equi-join only). */
  def candidatesG(s: SparkSession, d: String, g: Double): Long = {
    val a = Spatial.withCellsG(Spatial.ordersBbox(s, d), g,
      "min_lon", "max_lon", "min_lat", "max_lat")
    val b = Spatial.withCellsG(Spatial.customerBbox(s, d), g,
      "c_min_lon", "c_max_lon", "c_min_lat", "c_max_lat")
    a.as("a").join(b.as("b"),
      col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy")).count()
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/testdata-local/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime; val n = body
      println(f"$label n=$n sec=${(System.nanoTime - t0) / 1e9}%.2f")
    }

    t("orders_rows")(Spatial.ordersBbox(spark, d).count())
    t("customer_rows")(Spatial.customerBbox(spark, d).count())
    val sa = Spatial.boxStats(Spatial.ordersBbox(spark, d),
      "min_lon", "max_lon", "min_lat", "max_lat")
    val sb = Spatial.boxStats(Spatial.customerBbox(spark, d),
      "c_min_lon", "c_max_lon", "c_min_lat", "c_max_lat")
    println(s"stats a=$sa b=$sb chooseGrid=${Spatial.chooseGrid(sa, sb)}")
    t("join_auto")(Spatial.joinBboxGrid(spark, d).count())
    // "-" as the 2nd arg: stats + auto join only (skip per-g sweeps —
    // the candidate COUNT itself costs a full join pass at high sf)
    for (g <- args.lift(1).filter(_ != "-")
        .map(_.split(",").map(_.toDouble).toSeq).getOrElse(
          if (args.lift(1).contains("-")) Seq.empty else Seq(4.0, 2.0, 8.0, 1.0))) {
      t(f"cellsA_g$g%.0f")(Spatial.withCellsG(Spatial.ordersBbox(spark, d), g,
        "min_lon", "max_lon", "min_lat", "max_lat").count())
      t(f"cellsB_g$g%.0f")(Spatial.withCellsG(Spatial.customerBbox(spark, d), g,
        "c_min_lon", "c_max_lon", "c_min_lat", "c_max_lat").count())
      t(f"cands_g$g%.0f")(candidatesG(spark, d, g))
      t(f"join_g$g%.0f_run1")(Spatial.joinBboxGridG(spark, d, g).count())
      t(f"join_g$g%.0f_run2")(Spatial.joinBboxGridG(spark, d, g).count())
    }
    spark.stop()
  }
}
