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
    // Phase 1 — ONE pass over the XML: parse and stage the raw relation
    // columnar. XML pull-parsing is the expensive pass; without staging
    // it runs three times (changesets write, comments write, and the
    // sampling pass repartitionByRange needs for its range boundaries).
    // Downstream reads of the snappy-parquet staging are cheap scans.
    // The extra write volume is the classic ELT staging trade and holds
    // at cluster scale for the same reason.
    // (Measured: the generic XML source beats the hand-rolled StAX
    // alternative (OsmXml.scanStax) ~26k vs ~18k rows/s here — the
    // Dataset row-encoder tax on nested case classes outweighs the
    // leaner parse. Keep the codegen'd source; scanStax remains the
    // golden-equality-tested fallback.)
    val staging = s"$outDir/_staging_raw"
    OsmXml.scan(spark, dumpPath).write.mode(SaveMode.Overwrite).parquet(staging)
    val raw = spark.read.parquet(staging)
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
    val counts = (spark.read.parquet(s"$outDir/changesets").count(),
      spark.read.parquet(s"$outDir/comments").count())
    // staging is scratch: drop it so the layout holds only the tables
    val stPath = java.nio.file.Paths.get(staging.stripPrefix("file:"))
    if (java.nio.file.Files.exists(stPath)) {
      val s = java.nio.file.Files.walk(stPath)
      try {
        val it = s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]()).iterator()
        while (it.hasNext) java.nio.file.Files.delete(it.next())
      } finally s.close()
    }
    counts
  }
}
