package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, ServeSession, Similarity}

/** The serve sessions are a LATENCY choice, not a semantic one: a
  * session probe over the pinned index must return exactly the
  * one-shot entries' relations (r14 VERDICT item 4). */
class ServeSessionSpec extends AnyFunSuite {
  private val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("")).toSet

  test("ANN session serve == one-shot sim_ivf_int8_bucketed on the same query ids") {
    val session = ServeSession.ann(spark, d)
    try {
      val oneShot = Similarity.simIvfInt8Bucketed(spark, d)
      assert(rowsOf(session.serveIds(Seq(0L, 1L, 2L))) === rowsOf(oneShot))
    } finally session.close()
  }

  test("ANN session serves an AD-HOC query batch (not just corpus ids), results match the kernel") {
    val session = ServeSession.ann(spark, d)
    try {
      // a batch of 4 corpus vectors re-labeled with fresh query ids —
      // the parameter-relation shape an online caller sends
      val batch = Tables.embeddings(spark, d)
        .filter(col("vec_id") >= 10 && col("vec_id") < 14)
        .select((col("vec_id") + 1000L).as("query_id"), col("embedding"))
      val served = session.serve(batch)
      assert(served.select("query_id").distinct().count() === 4)
      // every query gets its full top-5 and ranks are 1..5
      val perQ = served.groupBy("query_id").count().collect()
      assert(perQ.forall(_.getLong(1) === 5L))
      assert(served.agg(max("rnk")).head().getInt(0) === 5)
      // a second serve on the SAME session (the reuse path) is identical
      assert(rowsOf(session.serve(batch)) === rowsOf(served))
    } finally session.close()
  }

  test("BM25 session serve == one-shot text_bm25_bucketed on the same query ids") {
    val session = ServeSession.bm25(spark, d)
    try {
      val oneShot = Retrieval.textBm25Bucketed(spark, d)
      assert(rowsOf(session.serveIds(Retrieval.QueryDocs)) === rowsOf(oneShot))
    } finally session.close()
  }

  test("BM25 session serves an ad-hoc (query_id, text) batch") {
    val session = ServeSession.bm25(spark, d)
    try {
      val batch = Tables.documents(spark, d)
        .filter(col("doc_id") < 4)
        .select((col("doc_id") + 5000L).as("query_id"), col("text"))
      val served = session.serve(batch)
      assert(served.select("query_id").distinct().count() === 4)
      assert(served.filter(col("rnk") === 1).count() === 4)
    } finally session.close()
  }
}
