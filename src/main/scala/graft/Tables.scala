package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table access layer over the driver-generated parquet test tables
  * (TESTDATA.md). One parquet file per table under `dir`.
  *
  * All engine operators take DataFrames, so in production the same
  * operators run over any source (partitioned parquet lake, JDBC,
  * streaming); this object is only the test-harness binding.
  */
object Tables {
  /** Harness parquet has shipped timestamps three ways across driver
    * versions: TIMESTAMP(NANOS) (rejected by the vectorized reader —
    * handled in `events`), UTC-adjusted micros (reads as `timestamp`),
    * and naive micros (isAdjustedToUTC=false, reads as
    * `timestamp_ntz`). The session timezone is pinned to UTC, so the
    * NTZ wall clock IS the UTC instant; cast it to `timestamp` at the
    * boundary so every operator downstream sees one type regardless of
    * which writer produced the file. */
  private def normalizeNtz(df: DataFrame): DataFrame =
    df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }.foldLeft(df)((acc, c) => acc.withColumn(c, col(c).cast(TimestampType)))

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read nanos as long and truncate to micros — the
    * same truncation DuckDB applies, so oracle comparisons line up. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Widen an input to the session's parallelism before a CPU-bound
    * per-row kernel (minhash/simhash signatures: 16 md5s per shingle).
    * A small file collapses to one parquet split, which would pin the
    * whole kernel to one task; the round-robin exchange of the RAW
    * rows is trivially cheap next to the kernel. No-op when the input
    * already has ≥ parallelism partitions — the 100 TB case, where
    * scans arrive thousands of splits wide and adding a shuffle here
    * would be pure waste. */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
