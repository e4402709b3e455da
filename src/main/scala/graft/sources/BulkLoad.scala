package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** EP1 — the bulk-load entry point (`changesetmd.py` `-c -f dump`),
  * Spark-shaped: distributed XML scan → narrow extract/cast → one
  * partitioned, locality-sorted columnar write. The reference's
  * "drop indexes, load, rebuild indexes" lifecycle collapses into the
  * layout of the single write:
  *   - partition by created_at month  ≙ created_at B-tree (partition
  *     pruning on date ranges),
  *   - sortWithinPartitions(id)       ≙ PK index (parquet min/max
  *     row-group stats),
  *   - comments written as the normalized child table alongside.
  * Returns (changesetRows, commentRows).
  */
object BulkLoad {

  def run(spark: SparkSession, dumpPath: String, outDir: String): (Long, Long) = {
    val raw = OsmXml.scan(spark, dumpPath)
    val cs = OsmXml.changesets(raw)
      .withColumn("created_month", date_format(col("created_at"), "yyyy-MM"))
    // range-partition on (month, id): keeps month-dir locality AND id
    // sort order while spreading work evenly across all cores (a plain
    // repartition(month) caps parallelism at #months)
    cs.repartitionByRange(col("created_month"), col("id"))
      .sortWithinPartitions(col("created_month"), col("id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("created_month")
      .parquet(s"$outDir/changesets")
    val cm = OsmXml.comments(raw)
    cm.write.mode(SaveMode.Overwrite).parquet(s"$outDir/comments")
    (spark.read.parquet(s"$outDir/changesets").count(),
      spark.read.parquet(s"$outDir/comments").count())
  }
}
