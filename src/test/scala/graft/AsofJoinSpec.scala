package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Known-answer as-of join semantics on a handcrafted timeline. */
class AsofJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("as-of: each click matches the latest purchase at or before it") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_asof")
    // user 1: purchases at t10 (id 100) and t20 (id 101);
    // clicks at t5 (no match), t15 (-> 100), t20 (equal ts -> 101), t25 (-> 101)
    // user 2: click only -> never matched
    Seq(
      (100L, ts(10), 1L, "purchase", 10.0, "{}"),
      (101L, ts(20), 1L, "purchase", 20.0, "{}"),
      (200L, ts(5), 1L, "click", 0.0, "{}"),
      (201L, ts(15), 1L, "click", 0.0, "{}"),
      (202L, ts(20), 1L, "click", 0.0, "{}"),
      (203L, ts(25), 1L, "click", 0.0, "{}"),
      (300L, ts(12), 2L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(tmp.resolve("events.parquet").toString)
    val r = graft.operators.Relational.joinAsof(spark, tmp.toString)
      .select("click_id", "purchase_id", "p_value")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(r === Array((201L, 100L, 10.0), (202L, 101L, 20.0), (203L, 101L, 20.0)))
  }

  test("sessionize: strict 30-min boundary — exactly 30 min continues the session") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sess")
    Seq(
      (1L, ts(0), 1L, "click", 0.0, "{}"),
      (2L, ts(30), 1L, "click", 0.0, "{}"),   // exactly 30 min -> same session
      (3L, ts(61), 1L, "click", 0.0, "{}"),   // 31 min -> new session
      (4L, ts(0), 2L, "click", 0.0, "{}"))    // other user starts at 1
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(tmp.resolve("events.parquet").toString)
    val r = graft.operators.Relational.winSessionize(spark, tmp.toString)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("as-of: same-(user, ts) purchases dedupe last-wins by event_id") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_asof2")
    Seq(
      (100L, ts(10), 1L, "purchase", 1.0, "{}"),
      (101L, ts(10), 1L, "purchase", 2.0, "{}"), // same instant, higher id wins
      (200L, ts(11), 1L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(tmp.resolve("events.parquet").toString)
    val r = graft.operators.Relational.joinAsof(spark, tmp.toString)
      .select("click_id", "purchase_id", "p_value")
      .as[(Long, Long, Double)].collect()
    assert(r === Array((200L, 101L, 2.0)))
  }
}
