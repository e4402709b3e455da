package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Multimodal column handling (SURVEY.md §2j multimodal_cols): opaque
  * binary payloads (image/audio/video bytes) alongside typed metadata,
  * with decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing is real and tested: BinaryType columns in
  * parquet, typed Dataset batches through mapPartitions (the Scala
  * analog of mapInPandas — one partition = one batch through the
  * decoder), deterministic partitioning, and explode-shaped frame
  * sampling. The decoder itself is a STUB (`decodeStub`): this
  * container ships no image/audio codecs, so it derives features from
  * the raw bytes deterministically; a real deployment swaps in JavaCV/
  * ffmpeg behind the same signature without touching any plan.
  */
object Multimodal {

  /** A "media asset": payload bytes + declared metadata. The test
    * corpus has no real media, so the payload is a deterministic
    * 16-byte pseudo-blob (md5 of the text). */
  def assets(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      unhex(md5(col("text"))).as("payload"),
      (lit(16) + col("doc_id") % 64).cast(IntegerType).as("width"),
      (lit(16) + col("doc_id") % 48).cast(IntegerType).as("height"),
      lit(3).as("channels"))

  case class Asset(doc_id: Long, payload: Array[Byte], width: Int, height: Int, channels: Int)
  case class Features(doc_id: Long, width: Int, height: Int,
      byte_len: Int, first_byte: Int, checksum: Int)

  /** STUB decoder — stands in for image decode + feature extraction.
    * Real bytes in, deterministic features out; the batch shape
    * (partition-wise iterator) is exactly what a JNI/ffmpeg decoder
    * needs. */
  def decodeStub(a: Asset): Features = {
    val sum = a.payload.foldLeft(0)((acc, b) => acc + (b & 0xff))
    Features(a.doc_id, a.width, a.height,
      a.payload.length, a.payload(0) & 0xff, sum % 256)
  }

  /** Decode pipeline: binary column → typed batches → features.
    * mapPartitions keeps decoder init per-partition (not per-row). */
  def multimodalDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds: Dataset[Asset] = assets(s, d).as[Asset]
    ds.mapPartitions(_.map(decodeStub)).toDF()
  }

  case class Resized(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, out_bytes: Int, checksum: Int)

  /** Resize stage: fit-within-target preserving aspect ratio, never
    * upscaling — the standard vision-preprocessing step (target 64
    * here so the synthetic 16–79 px assets exercise BOTH the downscale
    * and the keep branch; production uses 224 etc.). The geometry
    * (output dims, buffer size = out_w·out_h·channels) is exact
    * integer math and IS the Spark-side contract; the pixel resampler
    * itself is the same documented stub as decode (no codecs in this
    * container) — it carries the payload checksum through so the
    * oracle still checks real bytes. Typed mapPartitions batches,
    * like decode. */
  def multimodalResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds: Dataset[Asset] = assets(s, d).as[Asset]
    val target = 64
    ds.mapPartitions(_.map { a =>
      val m = math.max(a.width, a.height)
      val (ow, oh) =
        if (m <= target) (a.width, a.height) // never upscale
        else (math.max(1, a.width * target / m), math.max(1, a.height * target / m))
      val sum = a.payload.foldLeft(0)((acc, b) => acc + (b & 0xff))
      Resized(a.doc_id, a.width, a.height, ow, oh, ow * oh * a.channels, sum % 256)
    }).toDF()
  }

  /** Frame sampling: one row per sampled frame per asset (videos of
    * 1–4 frames at 25 fps) — the explode-shaped batch layout a video
    * pipeline feeds to per-frame models. */
  def multimodalFrames(s: SparkSession, d: String): DataFrame =
    assets(s, d)
      .withColumn("n_frames", (lit(1) + col("doc_id") % 4).cast(IntegerType))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_off_ms", col("frame_idx") * 40)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_decode" -> multimodalDecode _,
    "multimodal_resize" -> multimodalResize _,
    "multimodal_frames" -> multimodalFrames _
  )

  // Oracle reconstructs the byte features from md5 hex digits
  // (DuckDB-side nibble parse).
  private val hexByte = // byte i (0-based) of md5(text) as integer
    "((strpos('0123456789abcdef', substr(md5(text), 2*%1$s + 1, 1)) - 1) * 16 + " +
    "strpos('0123456789abcdef', substr(md5(text), 2*%1$s + 2, 1)) - 1)"

  val oracles: Map[String, String] = Map(
    "multimodal_decode" ->
      s"""SELECT doc_id,
        |  CAST(16 + doc_id % 64 AS INTEGER) AS width,
        |  CAST(16 + doc_id % 48 AS INTEGER) AS height,
        |  16 AS byte_len,
        |  CAST(${hexByte.format("0")} AS INTEGER) AS first_byte,
        |  CAST(list_sum([${hexByte.format("i")} FOR i IN range(0, 16)]) % 256 AS INTEGER) AS checksum
        |FROM documents""".stripMargin,
    // same fit-within-64 integer geometry; checksum re-derived from
    // the md5 payload bytes like multimodal_decode
    "multimodal_resize" ->
      s"""WITH g AS (
        |  SELECT doc_id,
        |    CAST(16 + doc_id % 64 AS INTEGER) AS width,
        |    CAST(16 + doc_id % 48 AS INTEGER) AS height,
        |    greatest(16 + doc_id % 64, 16 + doc_id % 48) AS m,
        |    CAST(list_sum([${hexByte.format("i")} FOR i IN range(0, 16)]) % 256 AS INTEGER) AS checksum
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  CAST(CASE WHEN m <= 64 THEN width
        |       ELSE greatest(1, width * 64 // m) END AS INTEGER) AS out_w,
        |  CAST(CASE WHEN m <= 64 THEN height
        |       ELSE greatest(1, height * 64 // m) END AS INTEGER) AS out_h,
        |  CAST((CASE WHEN m <= 64 THEN width ELSE greatest(1, width * 64 // m) END)
        |     * (CASE WHEN m <= 64 THEN height ELSE greatest(1, height * 64 // m) END)
        |     * 3 AS INTEGER) AS out_bytes,
        |  checksum
        |FROM g""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id, CAST(1 + doc_id % 4 AS INTEGER) AS n_frames,
        |  CAST(f AS INTEGER) AS frame_idx,
        |  CAST(f * 40 AS INTEGER) AS frame_off_ms
        |FROM documents, unnest(range(0, 1 + doc_id % 4)) t(f)""".stripMargin
  )
}
