package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located (bucketed) join: the zero-shuffle FK-join layout
  * SCALING.md prescribes for changesets⋈comments at 100 TB. Both
  * sides written `bucketBy(8, key)`; the join must plan with NO
  * shuffle exchange on either side. */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("bucketed fact-fact join plans without any Exchange") {
    val d = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("graft_wh")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, d).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", wh.resolve("orders_b").toString)
        .saveAsTable("orders_b")
      Tables.lineitem(spark, d).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", wh.resolve("lineitem_b").toString)
        .saveAsTable("lineitem_b")

      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side (the final agg may)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"join input shuffled:\n$plan")
      // and results match the unbucketed join
      val expected = Tables.orders(spark, d)
        .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
