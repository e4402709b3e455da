package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SURVEY.md §2i): the reference extends
  * Postgres by installing extensions (hstore, PostGIS,
  * `queries.py:6,50-51`); this engine extends Spark by injecting
  * native functions through `SparkSessionExtensions`:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions()) ...
  *
  * or config `spark.sql.extensions=graft.functions.GraftExtensions`.
  * For sessions created elsewhere (the driver harness), `register`
  * adds the same functions to an existing session's registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(e.injectFunction)
    e.injectOptimizerRule(s => new graft.plans.GridBboxJoinRule(s))
    e.injectOptimizerRule(s => new graft.plans.BandJoinRule(s))
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val bboxAreaDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bbox_area"),
      info("bbox_area",
        "bbox_area(min_lon, min_lat, max_lon, max_lat) - equal-area m2 of a lon/lat envelope"),
      exprs => BboxArea(exprs(0), exprs(1), exprs(2), exprs(3)))

  val minhashSketchDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("minhash_sketch"),
      info("minhash_sketch",
        "minhash_sketch(expr, k) - k-slot MinHash signature of the grouped values"),
      exprs => MinHashAgg(exprs.head,
        exprs(1).eval().asInstanceOf[Int]).toAggregateExpression())

  val dotF32Desc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("dot_f32"),
      info("dot_f32",
        "dot_f32(a, b) - strict left-fold double dot product of two ARRAY<FLOAT> vectors"),
      exprs => {
        require(exprs.length == 2,
          s"dot_f32 requires exactly 2 arguments, got ${exprs.length}")
        DotF32(DotF32.normNull(exprs(0)), DotF32.normNull(exprs(1)))
      })

  val dotI8Desc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("dot_i8"),
      info("dot_i8",
        "dot_i8(a, b) - exact integer dot product of two ARRAY<TINYINT> code vectors"),
      exprs => {
        require(exprs.length == 2,
          s"dot_i8 requires exactly 2 arguments, got ${exprs.length}")
        DotI8(DotI8.normNull(exprs(0)), DotI8.normNull(exprs(1)))
      })

  val quantizeI8Desc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("quantize_i8"),
      info("quantize_i8",
        "quantize_i8(v) - symmetric int8 quantization of an ARRAY<FLOAT>: struct(scale, codes)"),
      exprs => {
        require(exprs.length == 1,
          s"quantize_i8 requires exactly 1 argument, got ${exprs.length}")
        QuantizeI8(exprs.head)
      })

  val gramStatsDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("gram_stats"),
      info("gram_stats",
        "gram_stats(words) - 2-gram repetition stats of a word array: struct(n_grams, n_uniq_grams, max_gram_n)"),
      exprs => {
        require(exprs.length == 1,
          s"gram_stats requires exactly 1 argument, got ${exprs.length}")
        GramStats(exprs.head)
      })

  /** A foldable integer argument (e.g. the k of a signature). */
  private def intArg(fn: String, e: Expression): Int = {
    require(e.foldable, s"$fn: k must be a literal")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$fn: k must be an INT literal, got $other")
    }
  }

  val wordShinglesDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(words_array, k) - distinct k-word shingles, first-occurrence order"),
      exprs => {
        require(exprs.length == 2,
          s"word_shingles requires exactly 2 arguments, got ${exprs.length}")
        WordShingles(exprs(0), intArg("word_shingles", exprs(1)))
      })

  val posGramHashesDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("pos_gram_hashes"),
      info("pos_gram_hashes",
        "pos_gram_hashes(words_array, k) - positional k-word gram md5-16 hashes with multiplicity"),
      exprs => {
        require(exprs.length == 2,
          s"pos_gram_hashes requires exactly 2 arguments, got ${exprs.length}")
        PosGramHashes(exprs(0), intArg("pos_gram_hashes", exprs(1)))
      })

  val minhashSigDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(shingles_array, k) - k-slot MinHash signature (md5-prefix family)"),
      exprs => {
        require(exprs.length == 2,
          s"minhash_sig requires exactly 2 arguments, got ${exprs.length}")
        MinHashSig(exprs(0), intArg("minhash_sig", exprs(1)))
      })

  val simhash32Desc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("simhash32"),
      info("simhash32",
        "simhash32(tokens_array) - 32-bit SimHash bit-majority signature"),
      exprs => {
        require(exprs.length == 1,
          s"simhash32 requires exactly 1 argument, got ${exprs.length}")
        SimHash32(exprs.head)
      })

  val spaceSavingDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("space_saving"),
      info("space_saving",
        "space_saving(expr, m) - m-entry SpaceSaving heavy-hitter candidate set of the grouped values"),
      exprs => {
        require(exprs.length == 2,
          s"space_saving requires exactly 2 arguments, got ${exprs.length}")
        SpaceSavingAgg(exprs.head,
          intArg("space_saving", exprs(1))).toAggregateExpression()
      })

  val bloomMightContainDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(filter_bits, key) - probe a serialized Bloom filter (BINARY literal) with a BIGINT key"),
      exprs => {
        require(exprs.length == 2,
          s"bloom_might_contain requires exactly 2 arguments, got ${exprs.length}")
        BloomMightContain(exprs(0), exprs(1))
      })

  val hilbert32Desc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("hilbert32"),
      info("hilbert32",
        "hilbert32(x, y) - 32-bit Hilbert-curve index of two 16-bit BIGINT bucket ids"),
      exprs => {
        require(exprs.length == 2,
          s"hilbert32 requires exactly 2 arguments, got ${exprs.length}")
        HilbertIndex32(exprs(0), exprs(1))
      })

  private[functions] val all = Seq(
    bboxAreaDesc, minhashSketchDesc, dotF32Desc, dotI8Desc, quantizeI8Desc,
    gramStatsDesc, wordShinglesDesc, posGramHashesDesc, minhashSigDesc, simhash32Desc,
    spaceSavingDesc, bloomMightContainDesc, hilbert32Desc)

  /** Runtime registration into an existing session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (id, inf, builder) =>
      reg.registerFunction(id, inf, builder)
    }
  }
}
