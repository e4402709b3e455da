package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Retrieval

/** Sparse-retrieval quality measurement — the BM25 analog of
  * `graft.Recall`'s ANN artifact: overlap@10 of `text_bm25_topk`
  * against the exact 3-gram-set Jaccard top-10 on the same corpus,
  * per query, per tier. BM25 is a RANKING function, not a Jaccard
  * estimator, so perfect overlap is not expected — the artifact
  * states how closely the idf/length-normalized ranking tracks plain
  * set similarity on this corpus (8–9/10 at sf0.01 when built).
  *
  * Run: `sbt "runMain graft.RetrievalProbe RETRIEVAL_r10.json [sfDir ...]"`.
  */
object RetrievalProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("RETRIEVAL_r10.json")
    val dirs = if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_retprobe_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val tiers = dirs.map { d =>
      val (per, mean) = overlapAt10(spark, d)
      val perS = per.toSeq.sortBy(_._1)
        .map { case (q, o) => s""""$q":$o""" }.mkString(",")
      println(s"[retprobe] $d mean_overlap@10=${fmt(mean)} per-query={$perS}")
      s""""$d":{"per_query":{$perS},"mean_overlap10":${fmt(mean)}}"""
    }
    val json = s"""{"metric":"bm25_overlap_vs_jaccard@10","queries":${
      Retrieval.QueryDocs.mkString("[", ",", "]")},"tiers":{${tiers.mkString(",")}}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(s"[retprobe] wrote $out")
    spark.stop()
  }

  /** Per-query |BM25 top-10 ∩ Jaccard top-10| and the mean. */
  def overlapAt10(s: SparkSession, d: String): (Map[Long, Int], Double) = {
    val docs = Tables.documents(s, d)
    val ids = Retrieval.QueryDocs
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "doc_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val bm = sets(Retrieval.textBm25Topk(s, d))
    val tr = sets(Retrieval.jaccardTop(docs, ids))
    val per = ids.map(q =>
      q -> bm.getOrElse(q, Set.empty).intersect(tr.getOrElse(q, Set.empty)).size).toMap
    (per, if (per.isEmpty) 0.0 else per.values.sum.toDouble / per.size)
  }
}
