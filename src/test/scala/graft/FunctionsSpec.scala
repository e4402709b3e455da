package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BboxArea, GraftExtensions, MinHashAgg}
import graft.operators.{Dedup, Spatial}

/** Custom Catalyst components: native bbox_area expression (codegen)
  * and the MinHash TypedImperativeAggregate. */
class FunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("native bbox_area equals the composed column expression bit-for-bit") {
    val boxes = Seq(
      (-74.05, 40.68, -74.04, 40.69),
      (-10.0, -10.0, 10.0, 10.0),
      (100.25, 45.5, 107.75, 52.25),
      (0.0, 0.0, 0.001, 0.001)).toDF("lo", "la", "hi", "ha")
    val both = boxes.select(
      BboxArea.bboxArea($"lo", $"la", $"hi", $"ha").as("native"),
      Spatial.areaM2($"lo", $"la", $"hi", $"ha").as("composed"))
    val rows = both.collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    // sanity: 20°x20° equatorial box ≈ 4.9e12 m²
    assert(math.abs(rows(1).getDouble(0) - 4.9e12) < 1e11)
  }

  test("bbox_area null semantics: any NULL corner -> NULL") {
    val df = Seq((Some(1.0), None: Option[Double])).toDF("a", "b")
    val r = df.select(BboxArea.bboxArea($"a", $"b", $"a", $"a")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("bbox_area registered via SparkSessionExtensions / registry and usable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT bbox_area(-10.0D, -10.0D, 10.0D, 10.0D) AS a").collect()(0)
    assert(math.abs(r.getDouble(0) - 4.9e12) < 1e11)
  }

  test("dot_f32 registered and usable from SQL; matches the left-fold semantics") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_f32(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
        |              CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) === 32.0)
    // length mismatch -> NULL (zip_with padding semantics)
    val n = spark.sql(
      """SELECT dot_f32(CAST(array(1.0) AS ARRAY<FLOAT>),
        |              CAST(array(1.0, 2.0) AS ARRAY<FLOAT>)) AS d""".stripMargin)
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("dot_i8: exact integer dot from SQL; null/length/type semantics match dot_f32") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_i8(CAST(array(1, -2, 127) AS ARRAY<TINYINT>),
        |              CAST(array(4, 5, 127) AS ARRAY<TINYINT>)) AS d""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) === 4L - 10L + 127L * 127L)
    // bit-equal to the portable HOF fold on the quantized corpus
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (_, q) = graft.operators.Similarity.quantizeCols(col("embedding"))
    val both = e.select(
      graft.functions.DotI8.dotI8(q, q).as("native"),
      aggregate(zip_with(q, q, (x, y) => x.cast("long") * y.cast("long")),
        lit(0L), (a, v) => a + v).as("hof"))
      .collect()
    both.foreach(r2 => assert(r2.getLong(0) === r2.getLong(1)))
    // length mismatch -> NULL; wrong type -> analysis error
    assert(spark.sql(
      """SELECT dot_i8(CAST(array(1) AS ARRAY<TINYINT>),
        |              CAST(array(1, 2) AS ARRAY<TINYINT>)) AS d""".stripMargin)
      .collect()(0).isNullAt(0))
    val err = intercept[Exception](spark.sql(
      "SELECT dot_i8(array(1, 2), array(3, 4))").collect())
    assert(err.getMessage.contains("dot_i8 requires"))
  }

  test("dot_f32 accepts untyped NULL literals (implicit cast) and returns NULL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_f32(NULL, CAST(array(1.0, 2.0) AS ARRAY<FLOAT>)) AS a,
        |       dot_f32(CAST(array(1.0) AS ARRAY<FLOAT>), NULL) AS b""".stripMargin)
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("dot_f32 rejects non-float arrays and wrong arity with analysis errors") {
    GraftExtensions.register(spark)
    // ARRAY<DOUBLE> (the natural bare-literal call) must be a clean
    // analysis error, not silent getFloat garbage on the unsafe path
    val typeErr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_f32(array(1.0, 2.0), array(3.0, 4.0))").collect()
    }
    assert(typeErr.getMessage.toLowerCase.contains("dot_f32"))
    val arityErr = intercept[Exception] {
      spark.sql("SELECT dot_f32(CAST(array(1.0) AS ARRAY<FLOAT>))").collect()
    }
    assert(arityErr.getMessage.contains("2 arguments") ||
      arityErr.getMessage.toLowerCase.contains("dot_f32"))
  }

  test("word_shingles / minhash_sig / simhash32 registered and usable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT word_shingles(split('a b c d', ' '), 3) AS sh,
        |       minhash_sig(array('x', 'y'), 2) AS sig,
        |       simhash32(array('x', 'y')) AS sim""".stripMargin).collect()(0)
    assert(r.getSeq[String](0) === Seq("a b c", "b c d"))
    // slots = min over {x, y} of substr(md5(seed:el), 1, 8)
    val exp = (0 until 2).map { s =>
      Seq("x", "y").map { el =>
        val d = java.security.MessageDigest.getInstance("MD5")
        d.digest(s"$s:$el".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      }.min
    }
    assert(r.getSeq[String](1) === exp)
    val simViaCol = Seq(Seq("x", "y")).toDF("t")
      .select(graft.functions.SimHash32.simhash32(col("t"))).collect()(0).getLong(0)
    assert(r.getLong(2) === simViaCol)
    // non-literal k -> clean error
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('x'), cast(rand()*4 AS INT))").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("strict type checks: wrong-typed input fails at analysis, not execution") {
    GraftExtensions.register(spark)
    Seq(
      "SELECT word_shingles(array(1, 2), 2)",
      "SELECT minhash_sig(array(1, 2), 2)",
      "SELECT space_saving(12, 4)").foreach { sql =>
      val e = intercept[Exception] { spark.sql(sql).collect() }
      val m = e.getMessage.toLowerCase
      assert(m.contains("requires") || m.contains("data type mismatch") ||
        m.contains("datatype_mismatch"), s"$sql gave unexpected error: ${e.getMessage}")
    }
  }

  test("native pq_encode equals the portable HOF form bit-for-bit on real residuals") {
    import graft.operators.Similarity
    val d = "/root/testdata/sf0.001"
    val cb = Similarity.pqCodebook(spark, d)
    val centDf = {
      val cents = Similarity.collectCentroids(spark, d)
      spark.createDataFrame(
        spark.sparkContext.parallelize(cents.toSeq.map { case (id, cv) =>
          org.apache.spark.sql.Row(id, cv.toSeq) }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cent_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cv",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType)))))
    }
    val resid = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"),
        Similarity.imiCellOf(spark, d)(col("embedding")).as("cell"),
        col("embedding"))
      .join(broadcast(centDf), col("cell") === col("cent_id"))
      .select(col("vec_id"),
        Similarity.residCol(col("embedding"), col("cv")).as("rv"))
    val both = resid.select(col("vec_id"),
      Similarity.pqCodesCol(cb)(col("rv")).as("native"),
      Similarity.pqCodesHof(cb)(col("rv")).as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Byte](1) === r.getSeq[Byte](2), s"vec ${r.getLong(0)}")
    }
    // same parity at the finer 16x4x16 geometry (sim_ivf_pq16)
    val g16 = Similarity.GeomPq16
    val cb16 = Similarity.pqCodebook(spark, d, g16)
    val both16 = resid.select(col("vec_id"),
      Similarity.pqCodesCol(cb16, g16)(col("rv")).as("native"),
      Similarity.pqCodesHof(cb16, g16)(col("rv")).as("hof")).collect()
    both16.foreach { r =>
      assert(r.getSeq[Byte](1).length === 16, s"vec ${r.getLong(0)}")
      assert(r.getSeq[Byte](1) === r.getSeq[Byte](2), s"vec ${r.getLong(0)}")
    }
    // null discipline: NULL residual -> NULL codes
    val nullRow = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS rv")
      .select(Similarity.pqCodesCol(cb)(col("rv"))).collect()
    assert(nullRow(0).isNullAt(0))
    graft.operators.Cleanup.dropAll(spark)
  }

  test("space_saving serde survives control characters in keys") {
    // keys containing the old US/RS sentinels must round-trip
    // the shuffle-serialized buffer intact (length-prefixed binary)
    val ctrl1 = "a\u001fb" // US, the old field separator
    val ctrl2 = "c\u001ed" // RS, the old entry separator
    val rows = (Seq.fill(40)(ctrl1) ++ Seq.fill(30)(ctrl2) ++
      (1 to 20).map(i => s"pad$i")).zipWithIndex
      .map { case (s, i) => (i % 8, s) } // many groups -> partial buffers merge
    val out = rows.toDF("g", "tok")
      .repartition(8) // force cross-partition merges (serde on every path)
      .groupBy(col("g"))
      .agg(graft.functions.SpaceSavingAgg.spaceSaving(col("tok"), 8).as("cand"))
      .select(explode(col("cand")).as("tok"))
      .collect().map(_.getString(0)).toSet
    assert(out.contains(ctrl1), "control-char key 1 corrupted in serde")
    assert(out.contains(ctrl2), "control-char key 2 corrupted in serde")
  }

  test("space_saving heavy hitters: eviction path keeps true frequent items (recall)") {
    // vocabulary (1000 distinct) far exceeds capacity (64): the sketch
    // must evict — yet every token with frequency > n/m is guaranteed
    // kept, so the two-pass operator still finds the exact top-10
    val heavy = (1 to 10).flatMap(h => Seq.fill(200 + h)(s"hot$h"))
    val noise = (1 to 990).flatMap(i => Seq.fill(3)(s"noise$i"))
    val docs = new scala.util.Random(7).shuffle(heavy ++ noise).grouped(50).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" "), "s0") }.toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft_ss")
    docs.toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val toks = spark.read.parquet(tmp.resolve("documents.parquet").toString)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val cands = toks.groupBy(col("source"))
      .agg(graft.functions.SpaceSavingAgg.spaceSaving(col("tok"), 64).as("cand"))
      .select(explode(col("cand")).as("tok"))
      .collect().map(_.getString(0)).toSet
    assert(cands.size <= 64)
    (1 to 10).foreach(h => assert(cands.contains(s"hot$h"),
      s"hot$h (freq ${200 + h} > n/m) must survive eviction"))
    // and the full two-pass operator returns the exact top-10
    val top = graft.operators.TextAnalysis.aggHeavyHitters(spark, tmp.toString)
      .select("tok", "n").as[(String, Long)].collect().toMap
    assert(top.keySet === (1 to 10).map(h => s"hot$h").toSet)
    (1 to 10).foreach(h => assert(top(s"hot$h") === 200L + h)) // EXACT counts
  }

  test("minhash_sketch slots equal independent per-element min (cross-check vs SQL md5)") {
    val df = Seq(("g1", "aa"), ("g1", "bb"), ("g1", "cc"), ("g2", "aa"))
      .toDF("g", "el")
    val sketch = df.groupBy($"g")
      .agg(MinHashAgg.minhashSketch($"el", 4).as("sk"))
    // independent recomputation of slot mins through Spark's md5 expression
    val slots = df.select($"g", $"el")
      .crossJoin(Seq(0, 1, 2, 3).toDF("seed"))
      .select($"g", $"seed",
        substring(md5(concat($"seed".cast("string"), lit(":"), $"el")), 1, 8).as("h"))
      .groupBy($"g", $"seed").agg(min($"h").as("mh"))
      .groupBy($"g").agg(sort_array(collect_list(struct($"seed", $"mh"))).as("slots"))
      .select($"g", expr("transform(slots, s -> s.mh)").as("expected"))
    val joined = sketch.join(slots, "g")
      .select($"g", $"sk", $"expected").collect()
    joined.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"group ${r.getString(0)}")
    }
    // identical element sets -> identical sketches regardless of group size
    val m = sketch.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(m("g1") !== m("g2"))
  }

  test("minhash sketch of identical sets matches; supersets only lower slots") {
    val a = Seq.tabulate(30)(i => ("x", s"tok$i")).toDF("g", "el")
    val sk1 = a.groupBy($"g").agg(MinHashAgg.minhashSketch($"el", 8)).collect()(0).getSeq[String](1)
    // same set split across many partitions -> same sketch (mergeability)
    val sk2 = a.repartition(13).groupBy($"g").agg(MinHashAgg.minhashSketch($"el", 8))
      .collect()(0).getSeq[String](1)
    assert(sk1 === sk2)
  }

  test("scrubPii redacts emails, IPv4s and dashed phones; leaves clean text alone") {
    import graft.operators.TextAnalysis
    val rows = Seq(
      ("mail me at a.b-c_1%x@sub.example.org thanks",
        "mail me at [EMAIL] thanks"),
      ("server 192.168.001.7 and backup 10.0.3.42 are up",
        "server [IP] and backup [IP] are up"),
      ("call 555-123-4567 today", "call [PHONE] today"),
      // all three in one string, adjacent punctuation preserved
      ("x@y.io, 1.2.3.4; 555-000-1111.", "[EMAIL], [IP]; [PHONE]."),
      // non-PII lookalikes survive: version strings (too many dots in a
      // row is still an IP match only for exactly 4 octets), bare words
      ("no pii here v1.2 and 12-34", "no pii here v1.2 and 12-34"))
      .toDF("in", "expected")
    rows.select(TextAnalysis.scrubPii($"in").as("got"), $"expected")
      .collect().foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("native gram_stats equals the portable HOF repetition stats on the corpus") {
    val words = split(col("text"), " ")
    val st = graft.functions.GramStats.gramStats(words)
    val (hn, hu, hm) = graft.operators.TextAnalysis.gramStatsHof(words)
    val both = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(size(words) >= 2)
      .select(st.getField("n_grams").as("nn"), st.getField("n_uniq_grams").as("nu"),
        st.getField("max_gram_n").as("nm"), hn.as("hn"), hu.as("hu"), hm.as("hm"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getInt(0) === r.getInt(3))
      assert(r.getInt(1) === r.getInt(4))
      assert(r.getInt(2) === r.getInt(5))
    }
  }

  test("repetition stats: planted repeated 2-gram flagged, distinct text passes") {
    // doc 0: "ab ab ab ..." — every 2-gram is the same pair;
    // doc 1: all-distinct words — zero duplicate 2-grams
    val docs = Seq(
      (0L, Seq.fill(20)("ab").mkString(" "), "s0"),
      (1L, (1 to 20).map(i => s"w$i").mkString(" "), "s0"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_rep")
    docs.toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val r = graft.operators.TextAnalysis.textRepetition(spark, tmp.toString)
      .orderBy("doc_id").collect()
    // doc 0: 19 grams, 1 distinct, top gram covers 100%
    assert(r(0).getAs[Int]("n_grams") === 19)
    assert(r(0).getAs[Int]("n_uniq_grams") === 1)
    assert(r(0).getAs[Int]("max_gram_n") === 19)
    assert(r(0).getAs[Int]("dup_gram_pct") === 94) // (19-1)*100 div 19
    assert(r(0).getAs[Int]("top_gram_pct") === 100)
    assert(r(0).getAs[Boolean]("is_repetitive"))
    // doc 1: every gram unique
    assert(r(1).getAs[Int]("n_uniq_grams") === 19)
    assert(r(1).getAs[Int]("dup_gram_pct") === 0)
    assert(r(1).getAs[Int]("top_gram_pct") === 5) // 100 div 19
    assert(!r(1).getAs[Boolean]("is_repetitive"))
  }

  test("surprisal: planted frequencies give exact integer bits per token") {
    // corpus of 16 tokens: a x8, b x4, c x1, d x3
    // bits = floor(log2(16 DIV freq)): a->1, b->2, c->4, d->2
    val docs = Seq(
      (0L, Seq.fill(8)("a").mkString(" "), "s0"),
      (1L, Seq.fill(4)("b").mkString(" "), "s0"),
      (2L, "c", "s0"),
      (3L, Seq.fill(3)("d").mkString(" "), "s0"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_surp")
    docs.toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val r = graft.operators.TextAnalysis.textSurprisal(spark, tmp.toString)
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getLong(3))).toSeq === Seq(
      (0L, 8, 8L, 100L),   // 8 tokens x 1 bit
      (1L, 4, 8L, 200L),   // 4 x 2
      (2L, 1, 4L, 400L),   // 1 x 4
      (3L, 3, 6L, 200L)))  // 3 x 2
  }

  test("surprisal: over-threshold join form equals the literal-map form") {
    val d = "/root/testdata/sf0.001"
    def run(): Seq[(Long, Int, Long, Long)] =
      graft.operators.TextAnalysis.textSurprisal(spark, d)
        .orderBy("doc_id").collect().toSeq
        .map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getLong(3)))
    val literal = run()
    spark.conf.set("spark.graft.surprisal.maxVocab", "0")
    try {
      val joined = run()
      assert(joined === literal)
      assert(joined.nonEmpty)
    } finally spark.conf.unset("spark.graft.surprisal.maxVocab")
  }

  test("profile_table: single-row exact profile over a known tier") {
    val p = graft.operators.TextAnalysis.profileDocs(TestSpark.session, "/root/testdata/sf0.001")
      .collect()(0)
    assert(p.getAs[Long]("n_rows") === 500L)
    assert(p.getAs[Long]("n_text") === 500L)      // no null texts in the tier
    assert(p.getAs[Long]("n_langs") === 5L)
    assert(p.getAs[Long]("min_chars") > 0L)
    assert(p.getAs[Double]("avg_chars") > 0.0)
  }
}
