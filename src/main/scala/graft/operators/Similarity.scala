package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables._

/** Similarity search over embedding columns (SURVEY.md §2j sim_topk):
  * brute-force cosine top-k as the exact baseline, plus two
  * sub-linear scale paths — random-hyperplane LSH bucketing
  * (Charikar, STOC 2002) and an IVF (inverted-file) coarse quantizer
  * (Jégou, Douze & Schmid, "Product quantization for nearest neighbor
  * search", TPAMI 2011 — the coarse-quantizer half, without PQ codes).
  *
  * Scale design:
  *  - The query side is tiny and broadcast; the corpus side never
  *    shuffles for the brute-force scan (map-side dot products +
  *    TakeOrderedAndProject-style per-query top-k).
  *  - LSH/IVF turn the cross product into an equi-join on
  *    bucket/cell id — the corpus is hash-partitioned by cell, each
  *    query probes one cell.
  *  - Dot products are explicit left-to-right double folds
  *    (`zip_with` + `aggregate`): deterministic, engine-portable, and
  *    at 100 TB immune to partitioning-dependent float reordering.
  */
object Similarity {

  /** Deterministic left-fold cosine of two (normalized) float
    * vectors — the native codegen expression (functions/
    * DotProductExpr.scala). Bit-equal to the portable HOF form below;
    * higher-order-function lambdas run INTERPRETED in Spark, which
    * made this fold the hot-loop tax of every ANN scan. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotF32.dotF32(a, b)

  /** Portable higher-order-function form of the same fold (what the
    * DuckDB oracle mirrors; SimilaritySpec asserts bit-equality with
    * the native expression). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Collect row field `i` as a float array, failing loudly on NULL
    * elements (getSeq[Float] would silently unbox null to 0.0f). */
  private[operators] def collectVector(r: org.apache.spark.sql.Row, i: Int): Array[Float] = {
    val raw = r.getSeq[Any](i)
    require(raw.forall(_ != null),
      s"embedding vector in row $r has NULL elements")
    raw.map(_.asInstanceOf[Float]).toArray
  }

  private def queryVectors(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))

  /** Coarse-quantizer centroid count — FIXED, independent of corpus
    * size. A production deployment tunes this (k ≈ √n, trained by a
    * few Lloyd rounds on a sample); what matters for scale is that k
    * does not grow with n, so assignment is O(n·k) and the broadcast
    * side is bounded. */
  val CentroidK = 16

  /** Bounded deterministic centroid set: the k corpus vectors with the
    * smallest md5(vec_id) — a fixed-size pseudo-random sample the
    * DuckDB oracle mirrors exactly. One O(n) scan with per-partition
    * top-k (TakeOrderedAndProject — PlanAudit-asserted): k rows reach
    * the driver, never the corpus. */
  def centroids(e: DataFrame, k: Int = CentroidK): DataFrame =
    e.orderBy(md5(col("vec_id").cast(StringType)), col("vec_id"))
      .limit(k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c"))

  /** Exact brute-force top-10 cosine neighbors for each of 3 query
    * vectors: broadcast queries × corpus scan, then TWO-LEVEL top-k.
    * Each scan task keeps at most k rows per query in a bounded heap
    * (mapPartitions — no shuffle), so only k·partitions·queries rows
    * reach the final per-query rank window. The corpus-sized shuffle
    * into #queries reducers that a direct window would cost is gone;
    * at 100 TB the heavy stage is embarrassingly parallel and the
    * merge input is KB-sized. Ties broken by vec_id, identical to the
    * single-window form. */
  def simTopk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 10
    val corpus = embeddings(s, d)
    val scored = corpus.join(broadcast(queryVectors(s, d)),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("q"), col("embedding")), 4).as("cos_r"))
    // worst-first ordering: the heap head is the row that falls out
    val worstFirst: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
    val partial = scored.as[(Long, Long, Double)].mapPartitions { it =>
      val heaps = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
      it.foreach { case (q, v, c) =>
        val h = heaps.getOrElseUpdate(q,
          scala.collection.mutable.PriorityQueue.empty(worstFirst))
        if (h.size < k) h.enqueue((c, v))
        else if (worstFirst.gt(h.head, (c, v))) { h.dequeue(); h.enqueue((c, v)) }
      }
      heaps.iterator.flatMap { case (q, h) =>
        h.iterator.map { case (c, v) => (q, v, c) } }
    }.toDF("query_id", "vec_id", "cos_r")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_r").desc, col("vec_id").asc)
    partial.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Random-hyperplane LSH: 8 data-derived hyperplanes (vectors
    * 100..107) → 8 sign bits → bucket id; queries search only their
    * bucket. Approximate: recall < 1, cost ~ corpus/2⁸ per query.
    *
    * The planes are collected to the driver (8 × 64 floats — tiny,
    * deterministic) and inlined as ARRAY<FLOAT> literals, so the
    * bucket id is a NARROW per-row expression: 8 codegen'd dot-product
    * sign bits summed in one projection. The corpus never shuffles,
    * never aggregates, and never inflates 8× to get bucketed
    * (PlanAudit asserts ABSENT:HashAggregate) — at 100 TB the bucket
    * stage is a pure map over the scan. */
  def simAnnLsh(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val planes: Array[(Long, Array[Float])] = e
      .filter(col("vec_id") >= 100 && col("vec_id") < 108)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), collectVector(r, 1)))
      .sortBy(_._1)
    // fail loudly: a missing plane would throw on reduce (or silently
    // shrink the bucket space); a NULL element would quietly unbox to
    // 0.0f and diverge from the expression/oracle NULL semantics
    require(planes.length == 8,
      s"LSH needs the 8 plane vectors 100..107; found ${planes.length}")
    def bucketOf(vecCol: Column): Column =
      planes.map { case (planeId, p) =>
        when(dot(vecCol, typedlit(p)) >= 0,
          lit(1L << (planeId - 100).toInt)).otherwise(lit(0L))
      }.reduce(_ + _)
    val corpusB = e.withColumn("bucket", bucketOf(col("embedding")))
    val queriesB = queryVectors(s, d).withColumnRenamed("q", "qv")
      .withColumn("qbucket", bucketOf(col("qv")))
    val cand = corpusB.join(broadcast(queriesB),
      col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_r").desc, col("vec_id").asc)
    cand.select(col("query_id"), col("vec_id"), col("bucket"),
        round(dot(col("qv"), col("embedding")), 4).as("cos_r"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
  }

  /** IVF coarse quantizer: a FIXED-k deterministic centroid sample
    * (bounded broadcast, O(n·k) assignment — k never grows with the
    * corpus); every vector is assigned to its max-cosine centroid via
    * a partial-aggregated max_by (the shuffle carries one row per
    * vector, argmax combines map-side); a query probes only its own
    * cell (nprobe=1). */
  def simIvf(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val cents = centroids(e)
    // assignment: argmax centroid per vector (broadcast bounded centroids)
    def assign(df: DataFrame, vecCol: String, idCol: String): DataFrame =
      df.crossJoin(broadcast(cents))
        .withColumn("ccos", round(dot(col(vecCol), col("c")), 4))
        .groupBy(col(idCol))
        .agg(
          any_value(col(vecCol)).as(vecCol),
          expr("max_by(cent_id, struct(ccos, -cent_id))").as("cent_id"))
    val cells = assign(e, "embedding", "vec_id")
      .select(col("vec_id"), col("cent_id").as("cell"), col("embedding"))
    val qcells = assign(queryVectors(s, d).withColumnRenamed("q", "qv"), "qv", "query_id")
      .select(col("query_id"), col("cent_id").as("qcell"), col("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_r").desc, col("vec_id").asc)
    cells.join(broadcast(qcells),
        col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("cell"),
        round(dot(col("qv"), col("embedding")), 4).as("cos_r"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk" -> simTopk _,
    "sim_ann_lsh" -> simAnnLsh _,
    "sim_ivf" -> simIvf _
  )

  private val dotSql =
    "list_sum(list_transform(range(1, 65), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)))"

  val oracles: Map[String, String] = Map(
    "sim_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
        |scored AS (
        |  SELECT query_id, e.vec_id,
        |    round(${dotSql.format("qv", "e.embedding")}, 4) AS cos_r
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
        |SELECT * FROM (
        |  SELECT query_id, vec_id, cos_r,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos_r DESC, vec_id ASC) AS rnk
        |  FROM scored) t
        |WHERE rnk <= 10""".stripMargin,
    "sim_ann_lsh" ->
      s"""WITH p AS (SELECT vec_id AS plane_id, embedding AS pv FROM embeddings
        |           WHERE vec_id >= 100 AND vec_id < 108),
        |cb AS (
        |  SELECT e.vec_id, e.embedding,
        |    sum(CASE WHEN ${dotSql.format("e.embedding", "pv")} >= 0
        |        THEN 1 << (plane_id - 100) ELSE 0 END)::BIGINT AS bucket
        |  FROM embeddings e, p GROUP BY e.vec_id, e.embedding),
        |qb AS (
        |  SELECT q.vec_id AS query_id, q.embedding AS qv,
        |    sum(CASE WHEN ${dotSql.format("q.embedding", "pv")} >= 0
        |        THEN 1 << (plane_id - 100) ELSE 0 END)::BIGINT AS qbucket
        |  FROM embeddings q, p WHERE q.vec_id < 3 GROUP BY q.vec_id, q.embedding)
        |SELECT query_id, vec_id, bucket, cos_r, rnk FROM (
        |  SELECT query_id, cb.vec_id, bucket,
        |    round(${dotSql.format("qv", "cb.embedding")}, 4) AS cos_r,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY round(${dotSql.format("qv", "cb.embedding")}, 4) DESC, cb.vec_id ASC) AS rnk
        |  FROM cb JOIN qb ON bucket = qbucket AND cb.vec_id <> query_id) t
        |WHERE rnk <= 5""".stripMargin,
    "sim_ivf" ->
      s"""WITH c AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $CentroidK),
        |cells AS (
        |  SELECT vec_id, embedding, cent_id AS cell FROM (
        |    SELECT e.vec_id, e.embedding, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${dotSql.format("e.embedding", "cv")}, 4) DESC, c.cent_id ASC) AS arnk
        |    FROM embeddings e, c) t WHERE arnk = 1),
        |qcells AS (
        |  SELECT query_id, qv, qcell FROM (
        |    SELECT q.vec_id AS query_id, q.embedding AS qv, c.cent_id AS qcell,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY round(${dotSql.format("q.embedding", "cv")}, 4) DESC, c.cent_id ASC) AS arnk
        |    FROM embeddings q, c WHERE q.vec_id < 3) t WHERE arnk = 1)
        |SELECT query_id, vec_id, cell, cos_r, rnk FROM (
        |  SELECT query_id, cells.vec_id, cell,
        |    round(${dotSql.format("qv", "cells.embedding")}, 4) AS cos_r,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY round(${dotSql.format("qv", "cells.embedding")}, 4) DESC, cells.vec_id ASC) AS rnk
        |  FROM cells JOIN qcells ON cell = qcell AND cells.vec_id <> query_id) t
        |WHERE rnk <= 5""".stripMargin
  )
}
