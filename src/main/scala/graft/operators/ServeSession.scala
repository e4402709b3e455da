package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Long-lived ONLINE serve sessions over the persisted index layouts
  * (r14 VERDICT item 4 — productize the 48 ms reused-plan number that
  * lived inside AnnBuildSoak's measurement code).
  *
  * The r14 serve-latency decomposition (BENCH_r14_annsoak.json
  * `serve_breakdown`) showed 98% of a cold one-shot probe is Spark
  * PLANNING — catalog resolution, file listing, bucketed-scan
  * planning, AQE finalization — not index work (6 ms of executor task
  * time at 5 M vectors). The deployment consequence: an online serve
  * node must amortize the expensive per-probe pieces across query
  * batches, exactly what these sessions do —
  *
  *   - index resolution happens ONCE at session open (catalog lookup,
  *     quantizer/codebook memo warm-up, file listing), and the code
  *     scan is pinned as an in-memory relation (`persist` +
  *     materialize) — the Spark-native form of "the serve node holds
  *     the index in RAM"; per-batch plans join a LocalTableScan of
  *     queries against an InMemoryRelation — no file listing, no
  *     bucketed-scan planning, no shuffle;
  *   - queries arrive as a PARAMETER RELATION (any (query_id,
  *     embedding) / (query_id, text) DataFrame — a local batch, a
  *     micro-batch, a view), so one probe serves the whole batch and
  *     the irreducible per-probe driver submit (~27 ms measured)
  *     amortizes to noise at batch sizes ≥16;
  *   - results are IDENTICAL to the one-shot entries
  *     (`sim_ivf_int8_bucketed` / `text_bm25_bucketed`) — pinned in
  *     ServeSessionSpec; the session is a latency choice, not a
  *     semantic one.
  *
  * Throughput vs batch size (16 / 256 / 4096 queries per probe) is
  * measured by `graft.AnnBuildSoak` → BENCH_r15_annsoak.json
  * `serve_batched`.
  *
  * 100 TB shape: the pinned relation is the PROBED columns only
  * (vec_id, cell, c_scale, cq ≈ 80 B/vector int8; postings rows for
  * the BM25 side) and `MEMORY_AND_DISK` degrades gracefully past RAM;
  * a fleet shards by cell/gram bucket and each serve node pins its
  * shard — the same architecture as the bucketBy layout it reads.
  */
object ServeSession {

  /** Open the ANN serve session: resolve + pin the int8 code scan. */
  def ann(s: SparkSession, d: String): AnnServeSession =
    new AnnServeSession(s, d)

  /** Open the BM25 serve session: resolve + pin the postings index. */
  def bm25(s: SparkSession, d: String): Bm25ServeSession =
    new Bm25ServeSession(s, d)
}

/** Serve session over the persisted bucketBy(cell) int8 ANN index —
  * the documented online entry for `sim_ivf_int8_bucketed`'s layout.
  * `serve(queries)` takes any (query_id, embedding) relation and
  * returns the same (query_id, vec_id, cell, cos_q, rnk) top-5
  * relation as the one-shot entry. */
final class AnnServeSession private[operators] (s: SparkSession, d: String) {
  import Similarity._

  // resolved once per session: builds the index table if absent,
  // warms the quantizer memos, pins the probed columns hot
  private val index: DataFrame = bucketedIndexTable(s, d)
    .select(col("vec_id"), col("cell"), col("c_scale"), col("cq"))
    .persist(StorageLevel.MEMORY_AND_DISK)
  index.count() // materialize at open, not on the first query's clock

  private val cellOf = imiCellOf(s, d) _

  /** One probe of a query batch: quantize the QUERY side only, then
    * the frozen-int8 serve kernel against the pinned code relation —
    * the same kernel every maintained/bucketed serve path uses. */
  def serve(queries: DataFrame): DataFrame = {
    val qcells = queries.select(col("query_id"),
      cellOf(col("embedding")).as("qcell"),
      quantizeCols(col("embedding"))._1.as("q_scale"),
      quantizeCols(col("embedding"))._2.as("qq"))
    frozenInt8Serve(index, qcells)
  }

  /** Convenience: serve corpus vectors by id (the gate entries'
    * query shape). */
  def serveIds(ids: Seq[Long]): DataFrame =
    serve(graft.Tables.embeddings(s, d)
      .filter(col("vec_id").isInCollection(ids))
      .select(col("vec_id").as("query_id"), col("embedding")))

  def close(): Unit = { index.unpersist(); () }
}

/** Serve session over the persisted bucketBy(g) BM25 postings index —
  * the documented online entry for `text_bm25_bucketed`'s layout.
  * `serve(queries)` takes any (query_id, text) relation and returns
  * the same (query_id, doc_id, score_x1000, rnk) top-k relation as
  * the one-shot entry. */
final class Bm25ServeSession private[operators] (s: SparkSession, d: String) {
  import Retrieval._

  private val (postings0, totals0) = bucketedPostings(s, d)
  private val postings: DataFrame =
    postings0.persist(StorageLevel.MEMORY_AND_DISK)
  postings.count()
  // totals is one row — collect once, re-broadcast as a local relation
  private val totals: DataFrame = {
    val r = totals0.collect().head
    import s.implicits._
    Seq((r.getLong(0), r.getLong(1))).toDF("n_docs", "t_grams")
  }

  def serve(queries: DataFrame, k: Int = 10): DataFrame =
    bm25Of(postings, totals, queryGramsOfRelation(queries), k)

  /** Convenience: serve corpus documents by id. */
  def serveIds(ids: Seq[Long], k: Int = 10): DataFrame =
    serve(graft.Tables.documents(s, d)
      .filter(col("doc_id").isInCollection(ids))
      .select(col("doc_id").as("query_id"), col("text")), k)

  def close(): Unit = { postings.unpersist(); () }
}
