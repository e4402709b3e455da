package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** Reproducible-sampling contracts: hash splits are stable under
  * corpus growth; balanced caps are deterministic per class. */
class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("hash split: ~80/10/10 shape and total preservation") {
    val d = "/root/testdata/sf0.001"
    val r = Sampling.sampleHashSplit(spark, d)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val total = r.values.sum
    assert(total === 500)
    assert(r("train") > 350 && r("train") < 450) // ≈ 80% of 500
    assert(r("val") > 20 && r("test") > 20)
  }

  test("hash split is stable: adding documents never moves an existing one") {
    val small = (1L to 200L).toDF("doc_id")
      .select(col("doc_id"), Sampling.splitOf(col("doc_id")).as("split"))
      .as[(Long, String)].collect().toMap
    val grown = (1L to 400L).toDF("doc_id")
      .select(col("doc_id"), Sampling.splitOf(col("doc_id")).as("split"))
      .as[(Long, String)].collect().toMap
    small.foreach { case (id, sp) => assert(grown(id) === sp) }
  }

  test("balanced cap keeps at most `cap` per class, deterministically") {
    val d = "/root/testdata/sf0.001"
    val once = Sampling.sampleBalanced(spark, d, cap = 10)
      .as[(Long, String, Int)].collect().toSet
    val again = Sampling.sampleBalanced(spark, d, cap = 10)
      .as[(Long, String, Int)].collect().toSet
    assert(once === again)
    once.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.size <= 10, s"$lang over cap") }
    // caps actually bind: the corpus has >10 docs in some language
    assert(once.groupBy(_._2).exists(_._2.size == 10))
  }

  test("stratified rate sampling: ~25% of en, ~75% of the rest, deterministic") {
    val d = "/root/testdata/sf0.01"
    val all = graft.Tables.documents(spark, d)
      .groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    val kept = Sampling.sampleStratified(spark, d)
      .groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    // en downsampled to ~25% (64/256), others kept at ~75% (192/256);
    // 5k docs per tier -> binomial noise stays well inside ±12pp
    val enRate = kept("en").toDouble / all("en")
    assert(enRate > 0.13 && enRate < 0.37, s"en rate $enRate")
    (all.keySet - "en").foreach { l =>
      val r = kept(l).toDouble / all(l)
      assert(r > 0.63 && r < 0.87, s"$l rate $r")
    }
    // determinism: same rows on a second run
    val again = Sampling.sampleStratified(spark, d)
      .as[(Long, String)].collect().toSet
    assert(Sampling.sampleStratified(spark, d)
      .as[(Long, String)].collect().toSet === again)
  }

  test("mixture: epochs are 1..n per doc, per-source totals track the weights") {
    val d = "/root/testdata/sf0.01"
    val rows = Sampling.sampleMixture(spark, d)
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n"), max(col("epoch")).as("maxe"),
        countDistinct(col("epoch")).as("ne"))
      .collect()
    // epochs of each doc are exactly 1..n (no gaps, no dupes)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") === r.getAs[Int]("maxe").toLong, r.toString)
      assert(r.getAs[Long]("ne") === r.getAs[Long]("n"), r.toString)
    }
    // weight(srcN) = 0.5 + 0.75·(N % 4); 25 docs/source at sf0.01 →
    // observed copies/doc within ~4σ binomial noise of the weight
    val bySrc = Sampling.sampleMixture(spark, d)
      .groupBy(col("source")).count()
      .as[(String, Long)].collect()
    assert(bySrc.length === 20)
    bySrc.foreach { case (src, n) =>
      val w = 0.5 + 0.75 * (src.drop(3).toInt % 4)
      val perDoc = n.toDouble / 25
      assert(math.abs(perDoc - w) < 0.4, s"$src: $perDoc vs weight $w")
    }
    // determinism: identical multiset on a second run
    val a = Sampling.sampleMixture(spark, d)
      .as[(Long, String, Int)].collect().toSet
    val b = Sampling.sampleMixture(spark, d)
      .as[(Long, String, Int)].collect().toSet
    assert(a === b)
  }
}
