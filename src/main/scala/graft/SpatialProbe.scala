package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch diagnostic for join_bbox_grid scaling (not part of the
  * library surface): times the grid join at several cell sizes and
  * prints exploded-row / candidate counts. */
object SpatialProbe {

  def withCellsG(df: DataFrame, g: Double, minLon: String, maxLon: String,
      minLat: String, maxLat: String): DataFrame =
    df.withColumn("cx", explode(sequence(
        floor(col(minLon) / g).cast(IntegerType),
        floor(col(maxLon) / g).cast(IntegerType))))
      .withColumn("cy", explode(sequence(
        floor(col(minLat) / g).cast(IntegerType),
        floor(col(maxLat) / g).cast(IntegerType))))

  def bboxG(s: SparkSession, d: String, g: Double): DataFrame = {
    val a = withCellsG(graft.operators.Spatial.ordersBbox(s, d), g, "min_lon", "max_lon", "min_lat", "max_lat")
    val b = withCellsG(graft.operators.Spatial.customerBbox(s, d), g, "c_min_lon", "c_max_lon", "c_min_lat", "c_max_lat")
    a.as("a").join(b.as("b"),
        col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy") &&
        col("min_lon") <= col("c_max_lon") && col("max_lon") >= col("c_min_lon") &&
        col("min_lat") <= col("c_max_lat") && col("max_lat") >= col("c_min_lat") &&
        col("a.cx") === floor(greatest(col("min_lon"), col("c_min_lon")) / g).cast(IntegerType) &&
        col("a.cy") === floor(greatest(col("min_lat"), col("c_min_lat")) / g).cast(IntegerType))
      .select(col("o_orderkey"), col("c_custkey"))
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_overlaps"), min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
  }

  /** Candidate pairs before the exact-predicate verify (cell equi-join only). */
  def candidatesG(s: SparkSession, d: String, g: Double): Long = {
    val a = withCellsG(graft.operators.Spatial.ordersBbox(s, d), g, "min_lon", "max_lon", "min_lat", "max_lat")
    val b = withCellsG(graft.operators.Spatial.customerBbox(s, d), g, "c_min_lon", "c_max_lon", "c_min_lat", "c_max_lat")
    a.as("a").join(b.as("b"), col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy")).count()
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

    t("orders_rows")(graft.operators.Spatial.ordersBbox(spark, d).count())
    t("customer_rows")(graft.operators.Spatial.customerBbox(spark, d).count())
    for (g <- args.lift(1).map(_.split(",").map(_.toDouble).toSeq).getOrElse(Seq(5.0, 2.0, 10.0, 3.0))) {
      t(f"cellsA_g$g%.0f")(withCellsG(graft.operators.Spatial.ordersBbox(spark, d), g, "min_lon", "max_lon", "min_lat", "max_lat").count())
      t(f"cellsB_g$g%.0f")(withCellsG(graft.operators.Spatial.customerBbox(spark, d), g, "c_min_lon", "c_max_lon", "c_min_lat", "c_max_lat").count())
      t(f"cands_g$g%.0f")(candidatesG(spark, d, g))
      t(f"join_g$g%.0f_run1")(bboxG(spark, d, g).count())
      t(f"join_g$g%.0f_run2")(bboxG(spark, d, g).count())
    }
    spark.stop()
  }
}
