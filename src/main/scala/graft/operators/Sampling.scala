package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Reproducible sampling for training-data curation (SURVEY.md §2j
  * family): hash-based splits and per-class caps.
  *
  * Both operators are DETERMINISTIC functions of the row key — no
  * `rand()` anywhere — which is what a training pipeline actually
  * needs: the same document lands in the same split on every run, on
  * any cluster, at any partitioning (Bernoulli `sample()` cannot
  * promise any of that, and a seeded RNG stream is engine-specific,
  * so it could never be oracle-checked). md5 is the portable hash
  * family the dedup suite already uses.
  *
  * Scale: both are one narrow projection over the scan; the split is
  * a tiny aggregate, the cap a per-class window — each a single hash
  * shuffle bounded by #classes.
  */
object Sampling {

  /** Split assignment by md5(doc_id) prefix: hex chars sort uniformly,
    * so first-2-chars < 'cc' ≈ 204/256 ≈ 80% train, < 'e6' ≈ +10%
    * val, rest test. A new document changes nothing about where
    * existing documents land — the property that makes hash splits
    * the reproducible-train/test standard. */
  def splitOf(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h2 = substring(md5(key.cast("string")), 1, 2)
    when(h2 < "cc", "train").when(h2 < "e6", "val").otherwise("test")
  }

  /** Gate query: split the documents corpus and report per-split
    * stats (counts prove the ~80/10/10 shape; min/max prove
    * assignment determinism). */
  def sampleHashSplit(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), splitOf(col("doc_id")).as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))

  /** Per-class balanced cap: keep at most `cap` documents per
    * language, chosen by md5(doc_id) order — a deterministic uniform
    * subsample within each class (the class-rebalancing step of a
    * curation pipeline). One window per class partition; the md5
    * order means adding documents to one class never reshuffles
    * another class's keep-set. */
  def sampleBalanced(s: SparkSession, d: String, cap: Int = 50): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    documents(s, d)
      .select(col("doc_id"), col("lang"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= cap)
  }

  /** Per-stratum RATE sampling: downsample the dominant language to
    * 25% and keep 75% of everything else — rebalance-by-rate,
    * complementing `sampleBalanced`'s rebalance-by-cap (a cap needs a
    * window per class; a rate is a pure per-row filter, so this form
    * is the cheaper one when class sizes are already known). The
    * threshold compares the first two md5 hex chars: '40' = 64/256 =
    * 25%, 'c0' = 192/256 = 75%. Same determinism contract as
    * `splitOf`: membership is a function of the key alone. */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val thr = when(col("lang") === "en", lit("40")).otherwise(lit("c0"))
    documents(s, d)
      .select(col("doc_id"), col("lang"))
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < thr)
  }

  /** Weighted corpus MIXING with fractional epochs — the
    * mixture-weights step of corpus assembly (a source with weight
    * 2.75 contributes every doc twice plus a deterministic 75%
    * subsample a third time; weight 0.5 contributes a 50% subsample).
    * Deterministic: the fractional epoch keeps doc d iff
    * md5(doc_id) < the weight's hex threshold — same contract as
    * `splitOf`, so the emitted multiset is a pure function of
    * (doc_id, source), independent of cluster or partitioning.
    *
    * Scale shape: a narrow projection + explode over the scan — no
    * shuffle, no join (the weight here is a function of the source
    * name; a production run broadcast-joins a source→weight dim
    * the same way `join_broadcast` does). Output size is
    * sum(weight_s · n_s), i.e. exactly the requested mixture. */
  def sampleMixture(s: SparkSession, d: String): DataFrame = {
    // weight(srcN) = 0.5 + 0.75·(N % 4) → 0.5, 1.25, 2.0, 2.75;
    // fractional parts 0.5/0.25/0.0/0.75 → md5-hex thresholds.
    val srcMod = expr("CAST(substring(source, 4) AS INT) % 4")
    val wFloor = element_at(typedlit(Seq(0, 1, 2, 2)), srcMod + 1)
    val hexThr = element_at(typedlit(Seq("80", "40", "00", "c0")), srcMod + 1)
    val nCopies = wFloor +
      when(substring(md5(col("doc_id").cast("string")), 1, 2) < hexThr, 1)
        .otherwise(0)
    documents(s, d)
      .select(col("doc_id"), col("source"), nCopies.as("n_copies"))
      .filter(col("n_copies") >= 1) // sequence(1,0) would DESCEND in Spark
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), col("n_copies"))).as("epoch"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_hash_split" -> sampleHashSplit _,
    "sample_balanced" -> ((s: SparkSession, d: String) => sampleBalanced(s, d)),
    "sample_stratified" -> sampleStratified _,
    "sample_mixture" -> sampleMixture _
  )

  val oracles: Map[String, String] = Map(
    "sample_hash_split" ->
      """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |            ELSE 'test' END AS split,
        |  count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY 1""".stripMargin,
    "sample_balanced" ->
      """SELECT doc_id, lang, rnk FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        |  FROM documents) t
        |WHERE rnk <= 50""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
        |    < (CASE WHEN lang = 'en' THEN '40' ELSE 'c0' END)""".stripMargin,
    "sample_mixture" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |    ([0, 1, 2, 2])[CAST(substr(source, 4) AS INT) % 4 + 1]
        |      + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
        |          < (['80', '40', '00', 'c0'])[CAST(substr(source, 4) AS INT) % 4 + 1]
        |        THEN 1 ELSE 0 END AS n_copies
        |  FROM documents)
        |SELECT doc_id, source, CAST(epoch AS INT) AS epoch
        |FROM w, unnest(generate_series(1, n_copies)) t(epoch)
        |WHERE n_copies >= 1""".stripMargin
  )
}
