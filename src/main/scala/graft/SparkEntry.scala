package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 demonstrated on
  * the driver test tables; `oracleSql` holds the DuckDB-equivalent SQL
  * for every SQL-expressible entry (same output column names — the
  * driver's compare hashes columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Join + exact-decimal agg + top-k: the pricing-summary /
    * top-editors shape the reference documents (`README.md:106-124`).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.orders(spark, d)
      .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(12, 2)))
          .cast(DoubleType).as("sum_price"))
      .orderBy(col("sum_price").desc)
      .limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ JsonMap.queries ++ Spatial.queries ++
      Upsert.queries ++ Ingest.queries ++ graft.streaming.Replication.queries ++
      graft.streaming.EventStreams.queries ++
      Dedup.queries ++ Similarity.queries ++ TextAnalysis.queries ++ Multimodal.queries ++
      Pipeline.queries ++ Sampling.queries ++ Layout.queries ++ BloomJoin.queries ++
      Retrieval.queries ++ Main.queries ++ SqlSurface.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ JsonMap.oracles ++ Spatial.oracles ++
      Upsert.oracles ++ Ingest.oracles ++ graft.streaming.Replication.oracles ++
      graft.streaming.EventStreams.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ TextAnalysis.oracles ++ Multimodal.oracles ++
      Pipeline.oracles ++ Sampling.oracles ++ Layout.oracles ++ BloomJoin.oracles ++
      Retrieval.oracles ++ Main.oracles ++ SqlSurface.oracles
}
