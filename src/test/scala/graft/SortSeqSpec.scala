package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Degenerate-sort-key fixtures for the two-pass bucketed global
  * numbering (`Relational.sortSeq`): the r8 verdict's remaining §2f
  * data-shape cliff. The semantic oracle here is the naive
  * single-window `row_number() OVER (ORDER BY ts, event_id)` — the
  * exact form sortSeq exists to avoid funneling 100 TB through. */
class SortSeqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def writeEvents(rows: Seq[(Option[java.sql.Timestamp], Long, Long)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sortseq")
    rows.toDF("ts", "event_id", "user_id")
      .write.mode("overwrite").parquet(tmp.resolve("events.parquet").toString)
    tmp.toString
  }

  private def naiveSeq(d: String): Map[Long, Long] = {
    val w = Window.orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, d)
      .select(col("event_id"), row_number().over(w).cast("long").as("seq"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def got(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(r.fieldIndex("event_id")) ->
      r.getLong(r.fieldIndex("seq"))).toMap

  test("single-timestamp corpus: numbering matches the window oracle and spreads across tasks") {
    val t = java.sql.Timestamp.from(java.time.Instant.parse("2020-06-01T12:00:00Z"))
    val n = 4000
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((0 until n).toList)
      .map(i => (Some(t), i.toLong, (i % 7).toLong))
    val d = writeEvents(rows)
    val df = Relational.sortSeq(spark, d)
    assert(got(df) === naiveSeq(d))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      "degenerate ts span must refine the bucket by the tiebreaker, not collapse to one task")
    // the cliff itself: no task may hold (nearly) the whole corpus
    val perTask = df.withColumn("pid", spark_partition_id())
      .groupBy(col("pid")).count().collect().map(_.getLong(1))
    assert(perTask.max < (n * 0.8).toLong,
      s"one task holds ${perTask.max} of $n rows — the single-bucket collapse")
  }

  test("null ts rows are numbered first (Window NULLS FIRST parity)") {
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2021-01-01T00:00:00Z"))
    val rows = (0 until 200).map { i =>
      val ts = if (i % 10 == 0) None
      else Some(java.sql.Timestamp.from(
        java.time.Instant.parse("2021-01-01T00:00:00Z").plusSeconds(i.toLong * 3600)))
      (ts, i.toLong, (i % 5).toLong)
    } ++ Seq((Some(t0), 1000L, 0L))
    val d = writeEvents(rows)
    assert(got(Relational.sortSeq(spark, d)) === naiveSeq(d))
  }

  private def assertSpread(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    val perTask = df.withColumn("pid", spark_partition_id())
      .groupBy(col("pid")).count().collect().map(_.getLong(1))
    assert(perTask.max < (n * 0.6).toLong,
      s"one task holds ${perTask.max} of $n rows — skew not refined")
  }

  test("wide span with one hot timestamp: skew refinement spreads the hot second") {
    val base = java.time.Instant.parse("2020-01-01T00:00:00Z")
    val hotTs = java.sql.Timestamp.from(base.plusSeconds(180L * 86400))
    val rnd = new scala.util.Random(11)
    // 1000 rows across a year + 4000 rows in one hot second
    val rows = rnd.shuffle(
      (0 until 1000).map(i =>
        (Some(java.sql.Timestamp.from(base.plusSeconds(i.toLong * 31536))), i.toLong, 0L)) ++
      (1000 until 5000).map(i => (Some(hotTs), i.toLong, 1L)))
    val d = writeEvents(rows)
    val df = Relational.sortSeq(spark, d)
    assert(got(df) === naiveSeq(d))
    assertSpread(df, 5000)
  }

  test("wide span with a hot multi-timestamp cluster: finer ts slices spread it") {
    val base = java.time.Instant.parse("2020-01-01T00:00:00Z")
    val rnd = new scala.util.Random(12)
    // 1000 rows across a year + 4000 rows inside one hour (distinct ts)
    val rows = rnd.shuffle(
      (0 until 1000).map(i =>
        (Some(java.sql.Timestamp.from(base.plusSeconds(i.toLong * 31536))), i.toLong, 0L)) ++
      (1000 until 5000).map(i =>
        (Some(java.sql.Timestamp.from(base.plusSeconds(200L * 86400 + (i % 3600)))), i.toLong, 1L)))
    val d = writeEvents(rows)
    val df = Relational.sortSeq(spark, d)
    assert(got(df) === naiveSeq(d))
    assertSpread(df, 5000)
  }

  test("wide-span corpus unchanged (regression for the normal path)") {
    val rows = (0 until 500).map { i =>
      (Some(java.sql.Timestamp.from(
        java.time.Instant.parse("2019-01-01T00:00:00Z").plusSeconds(i.toLong * 86400))),
        (499 - i).toLong, (i % 3).toLong)
    }
    val d = writeEvents(rows)
    assert(got(Relational.sortSeq(spark, d)) === naiveSeq(d))
  }
}
