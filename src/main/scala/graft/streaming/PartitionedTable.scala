package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import graft.operators.Upsert

/** Partition-pruned upsert table — the 100 TB merge path promised in
  * SCALING.md (SURVEY.md §7 "hard parts": delete+insert on immutable
  * storage must not rewrite the table).
  *
  * Layout: rows are hash-bucketed by key into `nBuckets`; each bucket
  * holds immutable version directories; a manifest file maps
  * bucket → current version. A merge:
  *
  *   1. computes the bucket set of the update batch (tiny collect —
  *      bounded by nBuckets, not data),
  *   2. anti-join+unions ONLY those buckets' current data with the
  *      bucket-filtered updates,
  *   3. writes new version dirs for touched buckets and atomically
  *      swaps one manifest.
  *
  * Untouched buckets are untouched files: merge cost is
  * O(touched buckets), not O(table). Crash before the manifest swap
  * leaves the old manifest → old complete state (idempotent re-apply,
  * same contract UpsertSpec property-tests for the simple table).
  */
class PartitionedTable(val dir: Path, val keyCol: String, val nBuckets: Int) {

  private def manifestFile = dir.resolve("MANIFEST")

  private def bucketExpr = pmod(hash(col(keyCol)), lit(nBuckets))

  def exists: Boolean = Files.exists(manifestFile)

  /** bucket -> current version dir name (relative). */
  def manifest: Map[Int, String] =
    if (!exists) Map.empty
    else Files.readAllLines(manifestFile).asScala
      .map(_.split("=", 2)).collect { case Array(b, v) => b.toInt -> v }.toMap

  private def writeManifest(m: Map[Int, String]): Unit = {
    Files.createDirectories(dir)
    val tmp = dir.resolve("MANIFEST.tmp")
    Files.writeString(tmp,
      m.toSeq.sortBy(_._1).map { case (b, v) => s"$b=$v" }.mkString("", "\n", "\n"))
    Files.move(tmp, manifestFile, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def bucketPath(b: Int, version: String): Path =
    dir.resolve(f"b=$b%03d").resolve(version)

  def readBuckets(spark: SparkSession, buckets: Seq[Int]): DataFrame = {
    val m = manifest
    val paths = buckets.flatMap(b => m.get(b).map(v => bucketPath(b, v).toString))
    require(paths.nonEmpty, s"no committed buckets under $dir")
    spark.read.parquet(paths: _*)
  }

  def read(spark: SparkSession): DataFrame =
    readBuckets(spark, manifest.keys.toSeq.sorted)

  /** Merge `updates` (last-wins-compacted by caller) into the table,
    * rewriting only the buckets that hold update keys. Returns the
    * touched bucket ids. */
  def mergeInto(spark: SparkSession, updates: DataFrame): Seq[Int] = {
    val withBucket = updates.withColumn("__b", bucketExpr).cache()
    val touched = withBucket.select("__b").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val m = manifest
    val newVersions = touched.map { b =>
      val upd = withBucket.filter(col("__b") === b).drop("__b")
      val merged = m.get(b) match {
        case Some(v) =>
          Upsert.merge(spark.read.parquet(bucketPath(b, v).toString), upd, Seq(keyCol))
        case None => upd
      }
      val next = "v" + (m.get(b).map(_.drop(1).toLong + 1).getOrElse(0L))
      merged.write.mode(SaveMode.Overwrite).parquet(bucketPath(b, next).toString)
      b -> next
    }.toMap
    withBucket.unpersist()
    writeManifest(m ++ newVersions) // single atomic swap commits the merge
    touched
  }
}
