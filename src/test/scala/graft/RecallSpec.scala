package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Cleanup

/** ANN retrieval-quality floors (r8 VERDICT item 1). Two corpora:
  *
  *  - A PLANTED clustered corpus (25 well-separated unit centers,
  *    64 members each at noise 0.25 — the shape real LLM embeddings
  *    have): absolute recall floors are meaningful here, and the IMI
  *    routing must recover the clusters.
  *  - The driver's sf0.01 corpus (near-random 64-dim vectors — weak
  *    label signal only): absolute recall is bounded by the data for
  *    ANY sublinear index, so the floor is on LIFT over the
  *    random-probe baseline (recall ÷ probe fraction) and on the
  *    probe-knob monotonicity.
  */
class RecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def plantedCorpus(): String = {
    import spark.implicits._
    val nClusters = 25; val perCluster = 64; val dim = 64
    val rnd = new scala.util.Random(1234)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // noise VECTOR norm ≈ 0.32 (σ scaled by 1/√dim): in-cluster cosine
    // ~0.95, cross-cluster ~0 — the tight-cluster geometry real
    // embedding models produce (an unscaled σ makes dim-64 noise norm
    // dwarf the unit center and the corpus degenerates to random)
    val sigma = 0.32 / math.sqrt(dim.toDouble)
    val centers = Array.fill(nClusters)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val rows = (0 until nClusters * perCluster).map { i =>
      val c = i % nClusters // queries (vec_id < 64) span many clusters
      val v = unit(centers(c).map(_ + sigma * rnd.nextGaussian()))
      (i.toLong, v.map(_.toFloat).toSeq, c)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_recall")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(tmp.resolve("embeddings.parquet").toString)
    tmp.toString
  }

  private def byName(rs: Seq[Recall.MethodResult]): Map[String, Recall.MethodResult] =
    rs.map(r => r.name -> r).toMap

  test("planted clustered corpus: IMI routing recovers clusters; probe knob monotone") {
    val d = plantedCorpus()
    val (results, corpusN, imiParity, geom) = Recall.run(spark, d, 64)
    val m = byName(results)
    assert(imiParity, "driver-side np1 probe must equal the shipped imiCellOf")
    // the geometry block must explain the ceiling: exact scoring at
    // np4 can recall AT MOST the ground-truth share in the 4 probed
    // cells, and the IMI exact run should sit essentially AT it
    assert(m("sim_ivf_imi@np4").recallAt10 <= geom.gtInNp4Cells + 1e-9)
    assert(m("sim_ivf_imi@np4").recallAt10 >= geom.gtInNp4Cells - 1e-9,
      s"np4 exact run ${m("sim_ivf_imi@np4").recallAt10} vs ceiling ${geom.gtInNp4Cells}")
    results.foreach(r => info(
      f"${r.name}%-28s r@5=${r.recallAt5}%.3f r@10=${r.recallAt10}%.3f cand/q=${r.avgCandidates}%.1f"))
    assert(corpusN === 1600)
    // production routing finds the planted structure (measured: flat
    // 0.97@np1; beam-2 IMI 0.89@np1 / 0.91@np2 / 0.97@np4 — beam-1 was
    // 0.83@np1 at MORE candidates/query, the r9 imi_cell2 upgrade;
    // floors sit a few points under measured)
    assert(m("sim_ivf@np1").recallAt10 >= 0.90)
    assert(m("sim_ivf_nprobe@np2").recallAt10 >= 0.95)
    assert(m("sim_ivf_imi@np1").recallAt10 >= 0.82)
    // the r9 beam-2 upgrade dominates its beam-1 ablation on
    // clustered data — the measured reason imi_cell2 exists
    assert(m("sim_ivf_imi@np1").recallAt10 >=
      m("sim_ivf_imi_beam1@np1").recallAt10)
    assert(m("sim_ivf_imi@np2").recallAt10 >= 0.87)
    assert(m("sim_ivf_imi@np4").recallAt10 >= 0.93)
    assert(m("sim_ivf_imi@np2").recallAt10 >= m("sim_ivf_imi@np1").recallAt10)
    assert(m("sim_ivf_imi@np4").recallAt10 >= m("sim_ivf_imi@np2").recallAt10)
    // corpus multi-assignment lifts recall at the SAME query probe
    // count (paid in index footprint, not probes), and its candidate
    // set contains the single-assignment one by construction
    assert(m("sim_ivf_imi_ma@np1").recallAt10 >= m("sim_ivf_imi@np1").recallAt10)
    assert(m("sim_ivf_imi_ma@np1").recallAt10 >= 0.85)
    assert(m("sim_ivf_imi_ma@np2").recallAt10 >= m("sim_ivf_imi_ma@np1").recallAt10)
    // int8 scoring costs little recall on top of the routing
    assert(m("sim_ivf_int8@np1").recallAt10 >= m("sim_ivf_imi@np1").recallAt10 - 0.07)
    // the persisted serve layouts are the same index, bit-identically
    assert(m("sim_ivf_int8_bucketed@np1").topk === m("sim_ivf_int8@np1").topk)
    assert(m("sim_ivf_pq_bucketed@np1").topk === m("sim_ivf_pq@np1").topk)
    // multiprobe LSH dominates single-bucket LSH
    assert(m("sim_ann_lsh_multiprobe@p9").recallAt10 >= m("sim_ann_lsh@p1").recallAt10)
    // IVF-PQ: pure ADC at 0.5 bits/dim CANNOT order near-equidistant
    // cluster members (measured 0.23 — the documented ablation; still
    // clearly above the ~0.13 random-within-cell baseline), while the
    // production two-stage serve (ADC top-R shortlist + exact
    // re-rank) recovers most of the routing ceiling (measured
    // 0.81@np1 / 0.83@np2 vs IMI 0.89/0.91)
    assert(m("sim_ivf_pq@np1").recallAt10 >= 0.15)
    assert(m("sim_ivf_pq_rerank@np1").recallAt10 >= 0.75)
    assert(m("sim_ivf_pq_rerank@np1").recallAt10 >
      m("sim_ivf_pq@np1").recallAt10 + 0.3)
    assert(m("sim_ivf_pq_rerank@np2").recallAt10 >=
      m("sim_ivf_pq_rerank@np1").recallAt10)
    // the r11 quality lever: re-ranking the ADC shortlist with the
    // index's own INT8 codes (64 B/vector, no float fetched at any
    // stage) recovers the rerank lift over pure ADC — int8's
    // 0.2%-scale rounding sits far below planted-cluster neighbor
    // gaps, so the served list floors at the same level as the float
    // re-rank (measured equal at every real tier, RECALL_r11.json)
    assert(m("sim_ivf_pq_rerank_int8@np1").recallAt10 >
      m("sim_ivf_pq@np1").recallAt10 + 0.3)
    assert(m("sim_ivf_pq_rerank_int8@np1").recallAt10 >= 0.75)
    assert(m("sim_ivf_pq_rerank_int8@np2").recallAt10 >=
      m("sim_ivf_pq_rerank_int8@np1").recallAt10)
    Cleanup.dropAll(spark)
  }

  test("driver corpus (near-random vectors): lift over the random-probe baseline") {
    val d = "/root/testdata/sf0.01"
    val (results, corpusN, imiParity, geom) = Recall.run(spark, d, 64)
    val m = byName(results)
    assert(imiParity)
    assert(m("sim_ivf_imi@np4").recallAt10 <= geom.gtInNp4Cells + 1e-9,
      "exact scoring cannot beat its cell-coverage ceiling")
    results.foreach(r => info(
      f"${r.name}%-28s r@10=${r.recallAt10}%.3f cand/q=${r.avgCandidates}%.1f"))
    def lift(name: String): Double = {
      val r = m(name)
      r.recallAt10 / (r.avgCandidates / (corpusN - 1).toDouble)
    }
    // the index must beat probing the same corpus share at random
    assert(lift("sim_ivf_imi@np1") >= 1.5, s"lift=${lift("sim_ivf_imi@np1")}")
    assert(lift("sim_ivf_nprobe@np2") >= 1.5)
    // recall strictly gains along the probe knob
    assert(m("sim_ivf_imi_ma@np1").recallAt10 >= m("sim_ivf_imi@np1").recallAt10)
    assert(m("sim_ivf_imi@np2").recallAt10 >= m("sim_ivf_imi@np1").recallAt10)
    assert(m("sim_ivf_imi@np8").recallAt10 >= m("sim_ivf_imi@np2").recallAt10)
    assert(m("sim_ivf_int8_bucketed@np1").topk === m("sim_ivf_int8@np1").topk)
    Cleanup.dropAll(spark)
  }
}
