package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Z-order layout: kernel correctness (bit interleave), content
  * preservation, and the skipping property the layout exists for —
  * measured from the same parquet footers an engine prunes with. */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorder32 equals the reference bit interleave on boundary and random values") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 2L), (43690L, 21845L)) ++
      Seq.fill(50)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorder32(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === mortonRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-ordered copy preserves content exactly; 2-D box prunes better than the linear layout") {
    val d = "/root/testdata/sf0.001"
    val zDir = Layout.zorderedEventsDir(spark, d).resolve("events").toString
    val orig = Tables.events(spark, d)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val copy = spark.read.parquet(zDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    assert(copy.count() === orig.count())
    assert(copy.exceptAll(orig).isEmpty && orig.exceptAll(copy).isEmpty)

    val (uBand, tBand) = LayoutProbe.bands(spark, d)
    val linRoot = LayoutProbe.linearEventsDir(spark, d, 64)
    try {
      val lin = LayoutProbe.rowGroupStats(
        linRoot.resolve("events").toString, "user_id", "ts")
      val zed = LayoutProbe.rowGroupStats(zDir, "user_id", "ts")
      assert(lin.map(_._3).sum === zed.map(_._3).sum) // same rows on disk

      // a user-band predicate cannot prune a time-sorted layout …
      val (linUser, _) = LayoutProbe.matching(lin, Some(uBand), None)
      val (zUser, _) = LayoutProbe.matching(zed, Some(uBand), None)
      assert(zUser < linUser)
      // … and the 2-D box must prune at least as well under z-order
      val (linBox, _) = LayoutProbe.matching(lin, Some(uBand), Some(tBand))
      val (zBox, _) = LayoutProbe.matching(zed, Some(uBand), Some(tBand))
      assert(zBox <= linBox)
      assert(zBox < zed.size) // the layout does skip something
    } finally {
      val files = java.nio.file.Files.walk(linRoot)
      try files.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally files.close()
    }
  }

  test("hilbert32 matches the reference xy2d and is a bijection with d2xy") {
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 2L), (32768L, 32767L)) ++
      Seq.fill(50)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.HilbertIndex32.hilbert32(col("x"), col("y")).as("h"))
      .collect()
    got.foreach { r =>
      val (x, y, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(h === graft.functions.HilbertIndex32.xy2d(x, y), s"($x, $y)")
      assert(graft.functions.HilbertIndex32.d2xy(h) === ((x, y)), s"inverse of $h")
      assert(h >= 0L && h < (1L << 32), s"range of ($x, $y)")
    }
  }

  test("hilbert continuity: consecutive indexes are grid neighbors (z-order is not)") {
    // the locality property the curve is chosen for — checked exactly
    // over a full 256-step window plus random windows
    val rnd = new scala.util.Random(13)
    val starts = Seq(0L, 65536L, (1L << 32) - 257L) ++
      Seq.fill(20)(math.abs(rnd.nextLong()) % ((1L << 32) - 1))
    starts.foreach { s0 =>
      var d = s0
      while (d < s0 + 255 && d + 1 < (1L << 32)) {
        val (x1, y1) = graft.functions.HilbertIndex32.d2xy(d)
        val (x2, y2) = graft.functions.HilbertIndex32.d2xy(d + 1)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
          s"jump between d=$d and ${d + 1}")
        d += 1
      }
    }
  }

  test("hilbert copy preserves content; 2-D box prunes at least as well as z-order") {
    val d = "/root/testdata/sf0.001"
    val hDir = Layout.curveEventsDir(spark, d, "hilbert").resolve("events").toString
    val orig = Tables.events(spark, d)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val copy = spark.read.parquet(hDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    assert(copy.count() === orig.count())
    assert(copy.exceptAll(orig).isEmpty && orig.exceptAll(copy).isEmpty)

    val (uBand, tBand) = LayoutProbe.bands(spark, d)
    val zed = LayoutProbe.rowGroupStats(
      Layout.curveEventsDir(spark, d, "zorder").resolve("events").toString,
      "user_id", "ts")
    val hil = LayoutProbe.rowGroupStats(hDir, "user_id", "ts")
    assert(zed.map(_._3).sum === hil.map(_._3).sum)
    val (zBox, _) = LayoutProbe.matching(zed, Some(uBand), Some(tBand))
    val (hBox, _) = LayoutProbe.matching(hil, Some(uBand), Some(tBand))
    assert(hBox <= zBox, s"hilbert box scan $hBox vs zorder $zBox row groups")
    assert(hBox < hil.size)
  }

  test("gate query over the z copy equals the same aggregate over the original table") {
    val d = "/root/testdata/sf0.001"
    val got = Layout.layoutZorder(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ev = Tables.events(spark, d)
    val st = ev.agg(
      min(col("user_id")).as("umin"), max(col("user_id")).as("umax"),
      min(unix_micros(col("ts"))).as("tmin"),
      max(unix_micros(col("ts"))).as("tmax"))
    val want = ev.crossJoin(broadcast(st))
      .filter(
        col("user_id") >= col("umin") + expr("(umax - umin) * 25 DIV 100") &&
        col("user_id") <= col("umin") + expr("(umax - umin) * 35 DIV 100") &&
        unix_micros(col("ts")) >= col("tmin") + expr("(tmax - tmin) * 40 DIV 100") &&
        unix_micros(col("ts")) <= col("tmin") + expr("(tmax - tmin) * 60 DIV 100"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2))).as("sv"))
      .select(col("user_id"), col("n"),
        col("sv").cast(org.apache.spark.sql.types.DoubleType))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
