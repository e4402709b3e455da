package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import graft.Tables._

/** Multimodal column handling (SURVEY.md §2j multimodal_cols): opaque
  * binary payloads (image/audio/video bytes) alongside typed metadata,
  * with decode / feature-extract / resize / frame-sample stages.
  *
  * The decode and resize kernels are REAL: payloads are genuine PNGs
  * (encoded with `javax.imageio` — in the JDK, no external codecs),
  * decode reads actual pixel geometry and a raster checksum back out
  * of the bytes, and resize runs a real Graphics2D bilinear resample
  * before checksumming the resampled raster. The Spark shape is the
  * production one: BinaryType columns in parquet, typed Dataset
  * batches through mapPartitions (one partition = one batch through
  * the decoder, init per-partition not per-row), deterministic
  * partitioning, explode-shaped frame sampling. A deployment handling
  * JPEG/video swaps the ImageIO calls for JavaCV/ffmpeg behind the
  * same signatures without touching any plan.
  *
  * Test corpus assets are constant-color PNGs with geometry and fill
  * derived from doc_id — so the DuckDB oracle can state the decoded
  * width/height/checksum in closed form while the engine still does
  * the full encode→decode→resample round trip on real bytes.
  */
object Multimodal {

  /** Deterministic fill color for a doc's synthetic asset. */
  private def rgb(id: Long): (Int, Int, Int) =
    ((id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt)

  /** Encode a w×h constant-color RGB PNG. */
  private[graft] def encodePng(w: Int, h: Int, color: (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(new java.awt.Color(color._1, color._2, color._3))
      g.fillRect(0, 0, w, h)
    } finally g.dispose()
    encodePng(img)
  }

  private[graft] def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Sum of all R+G+B byte values of the raster, mod 256. */
  private[graft] def rasterChecksum(img: BufferedImage): Int = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        x += 1
      }
      y += 1
    }
    (sum % 256).toInt
  }

  /** A "media asset": payload bytes + declared metadata. Payload is a
    * real PNG whose geometry/fill derive from doc_id (decode verifies
    * the declared metadata against the actual bytes). */
  def assets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d).select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (16 + id % 64).toInt
        val h = (16 + id % 48).toInt
        Asset(id, encodePng(w, h, rgb(id)), w, h, 3)
      }
    }.toDF()
  }

  case class Asset(doc_id: Long, payload: Array[Byte], width: Int, height: Int, channels: Int)
  case class Features(doc_id: Long, width: Int, height: Int,
      n_pixels: Int, first_byte: Int, checksum: Int)

  /** Real PNG decode: geometry and checksum come from the decoded
    * raster, not the declared metadata. */
  private[graft] def decodeImage(a: Asset): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(a.payload))
    require(img != null, s"payload of doc ${a.doc_id} is not a decodable image")
    img
  }

  def decode(a: Asset): Features = {
    val img = decodeImage(a)
    Features(a.doc_id, img.getWidth, img.getHeight,
      img.getWidth * img.getHeight, a.payload(0) & 0xff, rasterChecksum(img))
  }

  /** Decode pipeline: binary column → typed batches → features.
    * mapPartitions keeps decoder init per-partition (not per-row). */
  def multimodalDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds: Dataset[Asset] = assets(s, d).as[Asset]
    ds.mapPartitions(_.map(decode)).toDF()
  }

  case class Resized(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, out_bytes: Int, checksum: Int)

  /** Resize stage: fit-within-target preserving aspect ratio, never
    * upscaling — the standard vision-preprocessing step (target 64
    * here so the synthetic 16–79 px assets exercise BOTH the downscale
    * and the keep branch; production uses 224 etc.). The resample is a
    * real Graphics2D bilinear drawImage into the target buffer; the
    * checksum is taken from the RESAMPLED raster, so the oracle checks
    * actual resampling output (constant-color inputs stay constant
    * under any interpolation, keeping it closed-form). */
  def multimodalResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds: Dataset[Asset] = assets(s, d).as[Asset]
    val target = 64
    ds.mapPartitions(_.map { a =>
      val img = decodeImage(a)
      val (w, h) = (img.getWidth, img.getHeight)
      val m = math.max(w, h)
      val (ow, oh) =
        if (m <= target) (w, h) // never upscale
        else (math.max(1, w * target / m), math.max(1, h * target / m))
      val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, ow, oh, null)
      } finally g.dispose()
      Resized(a.doc_id, w, h, ow, oh, ow * oh * a.channels, rasterChecksum(out))
    }).toDF()
  }

  /** Frame sampling: one row per sampled frame per asset (videos of
    * 1–4 frames at 25 fps) — the explode-shaped batch layout a video
    * pipeline feeds to per-frame models. Needs only ids, so it reads
    * the pruned documents scan, not the encoded payload column. */
  def multimodalFrames(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("n_frames", (lit(1) + col("doc_id") % 4).cast(IntegerType))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_off_ms", col("frame_idx") * 40)

  case class PcmAsset(doc_id: Long, pcm: Array[Byte])
  case class AudioWindow(doc_id: Long, window_id: Long, n_samples: Long,
      sum_abs: Long, peak: Long)

  /** Samples per synthetic audio asset and the deterministic s16
    * waveform: sample i of doc d is ((d·31 + i·17) mod 65536) − 32768
    * — integer-exact, so the DuckDB oracle states window features in
    * closed form while the engine round-trips real PCM bytes. */
  private[graft] def pcmSamples(id: Long): Int = (160 + id % 80).toInt
  private[graft] def pcmSample(id: Long, i: Int): Int =
    (((id * 31 + i.toLong * 17) % 65536) - 32768).toInt

  /** Synthetic PCM corpus: one s16le byte payload per document —
    * the audio analog of `assets` (BinaryType column, bytes built by
    * an encoder and PARSED back by the operator, not passed around as
    * typed samples). */
  def pcmAssets(s: SparkSession, d: String): Dataset[PcmAsset] = {
    import s.implicits._
    documents(s, d).select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = pcmSamples(id)
        val bytes = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = pcmSample(id, i)
          bytes(2 * i) = (v & 0xff).toByte          // little-endian s16
          bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        PcmAsset(id, bytes)
      }
    }
  }

  /** Windowed audio features over REAL PCM decode: parse the s16le
    * byte payload back into samples (pure byte arithmetic — no codec
    * dependency, unlike image decode there is nothing to stub) and
    * emit per-40-sample-window energy features. Explode-shaped like
    * frame sampling; row-local like every feature kernel (windows
    * never cross assets, so no shuffle beyond the output's own).
    * A real deployment swaps the s16le parser for an ffmpeg frame
    * reader behind the same Dataset[PcmAsset] → windows signature. */
  def multimodalAudioWindows(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val win = 40
    pcmAssets(s, d).flatMap { a =>
      val n = a.pcm.length / 2
      (0 until n).iterator.map { i =>
        val lo = a.pcm(2 * i) & 0xff
        val hi = a.pcm(2 * i + 1).toInt // sign-extended high byte
        (i / win, math.abs((hi << 8) | lo).toLong)
      }.toSeq.groupBy(_._1).toSeq.sortBy(_._1).map { case (w, ss) =>
        AudioWindow(a.doc_id, w.toLong, ss.size.toLong,
          ss.map(_._2).sum, ss.map(_._2).max)
      }
    }.toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_decode" -> multimodalDecode _,
    "multimodal_resize" -> multimodalResize _,
    "multimodal_frames" -> multimodalFrames _,
    "multimodal_audio_windows" -> multimodalAudioWindows _
  )

  // Closed-form expectations for the constant-color PNG corpus: the
  // decoded raster of a w×h fill-(r,g,b) PNG sums to w*h*(r+g+b), and
  // any resample of a constant image is the constant.
  private val rgbSumSql =
    "((doc_id % 256) + (doc_id * 7 % 256) + (doc_id * 13 % 256))"

  val oracles: Map[String, String] = Map(
    "multimodal_decode" ->
      s"""SELECT doc_id,
        |  CAST(16 + doc_id % 64 AS INTEGER) AS width,
        |  CAST(16 + doc_id % 48 AS INTEGER) AS height,
        |  CAST((16 + doc_id % 64) * (16 + doc_id % 48) AS INTEGER) AS n_pixels,
        |  CAST(137 AS INTEGER) AS first_byte,
        |  CAST((16 + doc_id % 64) * (16 + doc_id % 48) * $rgbSumSql % 256 AS INTEGER) AS checksum
        |FROM documents""".stripMargin,
    // same fit-within-64 integer geometry; resampled checksum stays
    // the constant-fill closed form
    "multimodal_resize" ->
      s"""WITH g AS (
        |  SELECT doc_id,
        |    CAST(16 + doc_id % 64 AS INTEGER) AS width,
        |    CAST(16 + doc_id % 48 AS INTEGER) AS height,
        |    greatest(16 + doc_id % 64, 16 + doc_id % 48) AS m
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  CAST(CASE WHEN m <= 64 THEN width
        |       ELSE greatest(1, width * 64 // m) END AS INTEGER) AS out_w,
        |  CAST(CASE WHEN m <= 64 THEN height
        |       ELSE greatest(1, height * 64 // m) END AS INTEGER) AS out_h,
        |  CAST((CASE WHEN m <= 64 THEN width ELSE greatest(1, width * 64 // m) END)
        |     * (CASE WHEN m <= 64 THEN height ELSE greatest(1, height * 64 // m) END)
        |     * 3 AS INTEGER) AS out_bytes,
        |  CAST((CASE WHEN m <= 64 THEN width ELSE greatest(1, width * 64 // m) END)
        |     * (CASE WHEN m <= 64 THEN height ELSE greatest(1, height * 64 // m) END)
        |     * $rgbSumSql % 256 AS INTEGER) AS checksum
        |FROM g""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id, CAST(1 + doc_id % 4 AS INTEGER) AS n_frames,
        |  CAST(f AS INTEGER) AS frame_idx,
        |  CAST(f * 40 AS INTEGER) AS frame_off_ms
        |FROM documents, unnest(range(0, 1 + doc_id % 4)) t(f)""".stripMargin,
    // the engine round-trips real s16le bytes; the oracle states the
    // deterministic waveform ((d*31 + i*17) mod 65536) - 32768 in
    // closed form. sum(BIGINT) -> HUGEINT, hence terminal casts.
    "multimodal_audio_windows" ->
      """WITH a AS (SELECT doc_id, 160 + doc_id % 80 AS n FROM documents),
        |w AS (SELECT doc_id, i,
        |    ((doc_id * 31 + i * 17) % 65536) - 32768 AS s
        |  FROM a, unnest(range(0, n)) t(i))
        |SELECT doc_id, i // 40 AS window_id, count(*) AS n_samples,
        |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
        |  CAST(max(abs(s)) AS BIGINT) AS peak
        |FROM w GROUP BY doc_id, i // 40""".stripMargin
  )
}
