package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType
import graft.Tables._

/** Text-analysis operators for training-data pipelines
  * (SURVEY.md §2j text_stats): language ID, quality scoring, token
  * counting, document fingerprinting.
  *
  * Everything is a narrow per-row expression over the `text` column —
  * no shuffle except where an operator is inherently relational
  * (fingerprint clustering). Scores and decisions are integer-valued
  * so results are bit-stable across engines and partitionings.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword
    * heuristic. (Real pipelines plug fastText etc. here; the Spark
    * plumbing — scoring, argmax, tie-break — is what this operator
    * owns.) */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "los", "y"),
    "de" -> Seq("der", "die", "und", "das", "mit"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "zh" -> Seq("shi", "bu", "wo", "ni", "ta"))

  private def inList(words: Column, list: Seq[String]): Column =
    size(filter(words, w => w.isInCollection(list)))

  /** Row-local language prediction over a text column — the same
    * priority-argmax the textLangid operator selects, as a single
    * expression (reused by Pipeline's fused annotation projection). */
  def langPred(text: Column): Column = {
    val words = split(text, " ")
    val score = stopwords.map { case (l, ws) => l -> inList(words, ws) }.toMap
    val langs = stopwords.map(_._1)
    langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((l, i), elseCol) =>
        val isMax = langs.drop(i + 1).map(o => score(l) >= score(o)).reduce(_ && _)
        when(isMax, lit(l)).otherwise(elseCol)
    }
  }

  /** Row-local winnowing fingerprint (min 16-hex md5 prefix over
    * 5-word shingles) — shared with Pipeline. Shingling runs the
    * native one-pass expression (bit-equal to the HOF form, spec-
    * tested); the md5-min stays a built-in transform. */
  def fingerprint(text: Column): Column =
    array_min(transform(graft.functions.WordShingles.shingles(text, 5),
      sh => substring(md5(sh), 1, 16)))

  /** Language ID: stopword-hit argmax with fixed priority tie-break
    * (list order above). */
  def textLangid(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    val scored = graft.Tables.spread(documents(s, d)).select(
      (Seq(col("doc_id"), col("lang")) ++
        stopwords.map { case (l, ws) => inList(words, ws).as(s"s_$l") }): _*)
    val langs = stopwords.map(_._1)
    // first language whose score is >= all later ones (priority argmax)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((l, i), elseCol) =>
        val isMax = langs.drop(i + 1)
          .map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
        when(isMax, lit(l)).otherwise(elseCol)
    }
    scored
      .withColumn("lang_pred", pred)
      .withColumn("is_match", col("lang_pred") === col("lang"))
  }

  /** Quality scoring: length/word/uniqueness ratios as integers plus
    * a boolean keep-decision — the filter stage of a data pipeline. */
  def textQuality(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    graft.Tables.spread(documents(s, d)).select(
      col("doc_id"),
      length(col("text")).as("n_chars_m"),
      size(words).as("n_words"),
      size(array_distinct(words)).as("n_uniq"),
      expr("(length(regexp_replace(text, ' ', '')) * 100) div size(split(text, ' '))")
        .as("avg_wlen_x100"),
      inList(words, stopwords.head._2).as("stop_hits"))
      .withColumn("uniq_pct", expr("(n_uniq * 100) div n_words"))
      .withColumn("is_quality",
        col("n_words") >= 20 && col("n_words") <= 200 && col("uniq_pct") >= 30)
  }

  /** Text normalization — the cleaning stage upstream of dedup in a
    * real pipeline: lowercase, collapse whitespace runs, strip
    * non-alphanumerics, plus the normalized content hash that
    * normalized-exact dedup keys on. */
  def textNormalize(s: SparkSession, d: String): DataFrame =
    graft.Tables.spread(documents(s, d)).select(
      col("doc_id"),
      regexp_replace(trim(lower(col("text"))), "\\s+", " ").as("norm_text"))
      .withColumn("norm_alnum",
        regexp_replace(col("norm_text"), "[^a-z0-9 ]", ""))
      .withColumn("norm_hash", md5(col("norm_alnum")))

  /** Token counting: whitespace tokens plus a BPE-ish greedy subword
    * segmentation (regex, deterministic in both engines). */
  def textTokens(s: SparkSession, d: String): DataFrame =
    graft.Tables.spread(documents(s, d)).select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      expr("size(regexp_extract_all(text, '[a-z]+', 0))").as("alpha_tokens"),
      expr("size(regexp_extract_all(text, '[0-9]+', 0))").as("num_tokens"),
      expr("size(regexp_extract_all(text, '[a-z]{1,4}', 0))").as("subword_tokens"),
      length(col("text")).as("n_chars_calc"))

  /** Document fingerprint: min 16-hex-digit md5 prefix over 5-word
    * shingles (a winnowing-style content fingerprint); docs sharing a
    * fingerprint cluster together. */
  def textFingerprint(s: SparkSession, d: String): DataFrame = {
    val fp = fingerprint(col("text"))
    graft.Tables.spread(documents(s, d))
      .filter(size(split(col("text"), " ")) >= 5)
      .select(col("doc_id"), fp.as("fingerprint"))
      .withColumn("cluster_n", count(lit(1)).over(Window.partitionBy(col("fingerprint"))))
  }

  /** Per-source top-10 tokens via the two-pass heavy-hitter shape:
    * pass 1 runs the mergeable SpaceSaving candidate sketch
    * (functions/SpaceSavingAgg.scala — constant m-entry state, map-side
    * combine, recall guaranteed for anything with frequency > n/m);
    * pass 2 re-counts ONLY the candidates exactly, so the output
    * carries true counts and the oracle is a plain exact GROUP BY.
    * At 100 TB the first pass is the point: vocabulary is unbounded,
    * but the shuffle carries m entries per source instead of the
    * full (source, token) key space of a blind count — and the exact
    * pass scans with a semi-join filter that prunes to candidates. */
  def aggHeavyHitters(s: SparkSession, d: String): DataFrame = {
    val m = 256
    val toks = graft.Tables.spread(documents(s, d))
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    // n_total and n_cand ride the sketch's own shuffle (same groupBy) —
    // they exist to CHECK the sketch's recall precondition below.
    val sketch = toks.groupBy(col("source"))
      .agg(graft.functions.SpaceSavingAgg.spaceSaving(col("tok"), m).as("cand"),
        count(lit(1)).as("n_total"))
      .withColumn("n_cand", size(col("cand")))
    val cands = sketch.select(
      col("source"), col("n_total"), col("n_cand"), explode(col("cand")).as("tok"))
    // Inner join ≡ the candidate semi-join ((source, tok) is unique on
    // the candidate side) but lets n_total/n_cand ride along; they are
    // functionally dependent on source, so grouping by them is free.
    // cands is provably tiny (<= m rows per source): broadcast it so
    // the corpus-sized token explode never shuffles on (source, tok) —
    // explicit rather than left to AQE's runtime size estimate
    val exact = toks.join(broadcast(cands), Seq("source", "tok"))
      .groupBy(col("source"), col("tok"), col("n_total"), col("n_cand"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("source")).orderBy(col("n").desc, col("tok").asc)
    val top = exact.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 10)
    // Exactness precondition (ADVICE r4): the top-10 equals ground
    // truth only when no evicted token could outrank the returned
    // 10th. Two sufficient conditions, checked per returned row:
    //  - n_cand < m: the sketch never evicted (merge only prunes past
    //    m, update only evicts at m), so candidates = full vocabulary;
    //  - n·m > n_total: any evicted token has true frequency ≤ n/m,
    //    strictly below this row's exact count.
    // assert_true raises AT EXECUTION if violated — inside a coalesce
    // filter so it can't be column-pruned away, and the result schema
    // is unchanged.
    top
      .filter(coalesce(
        assert_true(col("n_cand") < m || col("n") * m > col("n_total"),
          lit(s"space_saving(m=$m) recall precondition violated: a returned " +
            "top-10 count is <= n/m, so an evicted token could outrank it")),
        lit(true)))
      .select(col("source"), col("tok"), col("n"), col("rnk"))
  }

  /** PII patterns — email / IPv4 / dashed US phone. Deliberately
    * restricted to syntax valid in BOTH Java regex (Spark) and RE2
    * (DuckDB) — no lookarounds, no backrefs — so the scrub itself is
    * oracle-checkable bit-for-bit. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII redaction — the scrub stage of a curation pipeline, as a
    * narrow per-row projection (no shuffle, stays in whole-stage
    * codegen). Email first (its local part can contain digits/dots
    * that the other patterns would chew on), then IPv4, then phone. */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      EmailRe, "[EMAIL]"), Ipv4Re, "[IP]"), PhoneRe, "[PHONE]")

  /** Gate query for the scrub. The synthetic corpus text is PII-free
    * (no digits at all), so scrubbing it directly would prove nothing;
    * instead each row is augmented with doc_id-derived email + phone +
    * IPv4 — built identically in the DuckDB oracle — and the query
    * returns per-kind match counts before the scrub, the scrubbed
    * text, and the residual PII count after (must be 0). */
  def textPiiScrub(s: SparkSession, d: String): DataFrame = {
    val dirty = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@mail.example.com or 555-"),
      lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"), lit("-"),
      lpad(pmod(col("doc_id") * 7, lit(10000)).cast("string"), 4, "0"),
      lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"), lit("."),
      pmod(col("doc_id") * 3, lit(256)).cast("string"))
    def hits(c: Column, re: String): Column =
      size(regexp_extract_all(c, lit(re), lit(0)))
    graft.Tables.spread(documents(s, d))
      .select(col("doc_id"), dirty.as("t"))
      .select(
        col("doc_id"),
        hits(col("t"), EmailRe).as("n_email"),
        hits(col("t"), Ipv4Re).as("n_ip"),
        hits(col("t"), PhoneRe).as("n_phone"),
        scrubPii(col("t")).as("scrubbed"))
      .withColumn("n_residual",
        hits(col("scrubbed"), EmailRe) + hits(col("scrubbed"), Ipv4Re) +
          hits(col("scrubbed"), PhoneRe))
  }

  /** Gopher-style repetition stats (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * arXiv 2112.11446 §A1.1 — the repetition-removal family):
    * per-document duplicate-2-gram fraction and top-2-gram fraction,
    * plus the keep/drop decision. Everything is ROW-LOCAL — a single
    * projection over the scan, no shuffle — because repetition is an
    * intra-document property; the per-row gram self-count is
    * O(len²) in higher-order functions but len is bounded (documents
    * are length-capped upstream by the quality gate), so the cost is
    * a constant per row, embarrassingly parallel at any corpus size.
    * Integer percentages keep the decision bit-stable across engines. */
  def textRepetition(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    // native one-pass kernel (functions/GramStatsExpr.scala): the HOF
    // form re-filtered the whole gram list per distinct gram — O(L²)
    // interpreted lambda calls per row
    val st = graft.functions.GramStats.gramStats(words)
    graft.Tables.spread(documents(s, d))
      .filter(size(words) >= 2)
      .select(
        col("doc_id"),
        st.getField("n_grams").as("n_grams"),
        st.getField("n_uniq_grams").as("n_uniq_grams"),
        st.getField("max_gram_n").as("max_gram_n"))
      .withColumn("dup_gram_pct",
        expr("((n_grams - n_uniq_grams) * 100) div n_grams"))
      .withColumn("top_gram_pct", expr("(max_gram_n * 100) div n_grams"))
      .withColumn("is_repetitive",
        col("dup_gram_pct") >= 10 || col("top_gram_pct") >= 8)
  }

  /** Portable HOF form of the repetition stats (what the DuckDB
    * oracle mirrors; FunctionsSpec asserts value parity with the
    * native `gram_stats` expression). */
  def gramStatsHof(words: Column): (Column, Column, Column) = {
    val grams = transform(sequence(lit(0), size(words) - 2),
      i => concat_ws(" ", slice(words, i + 1, lit(2))))
    (size(grams),
      size(array_distinct(grams)),
      array_max(transform(array_distinct(grams),
        g => size(filter(grams, x => x === g)))))
  }

  /** Unigram-surprisal quality proxy — the "perplexity filter" stage
    * of a curation pipeline (CCNet-style: score each document by how
    * surprising its tokens are under a corpus-level unigram model;
    * very low = boilerplate, very high = noise). Deliberately
    * integer-valued: each token scores ⌊log2(total DIV freq)⌋ BITS of
    * surprisal, so per-document sums are exact integer arithmetic —
    * no float accumulation order anywhere (and floor(log2(k)) of an
    * integer k is ULP-robust: only exact powers of two land on
    * integer log2 values, where both engines are exact).
    *
    * Scale shape, gated on vocabulary size: an
    * `approx_count_distinct(tok)` probe (one mergeable-sketch pass)
    * picks the physical form. Below `spark.graft.surprisal.maxVocab`
    * (default 2M ⇒ tens of MB of driver state) the frequency table is
    * COLLECTED and applied as a literal map in a narrow per-row
    * projection — the collectCentroids pattern; the corpus is scanned
    * once with zero shuffle. Above it — a web-scale corpus has a
    * billions-token vocabulary that must never visit the driver — the
    * SAME integer bits come from an explode + join on token (Spark
    * broadcasts the frequency table when it fits, shuffle-joins
    * otherwise) and a per-document re-aggregation: one extra corpus
    * pass, no driver state, identical results (TextAnalysisSpec
    * asserts form-equality; PlanAudit pins the join form at a forced
    * threshold). The sketch path (`agg_heavy_hitters`) bounds
    * candidate vocabularies when even the join form is too wide. */
  // Both the cardinality probe and the literal bits map are pure
  // functions of the dataset — memoized per (session, dataset) like
  // Similarity.collectCentroids, so pipelineCurateFull + the gate's
  // repeated invocations train the unigram model ONCE. The map cache
  // is bounded by the vocab gate (≤ maxVocab entries).
  private[graft] val vocabCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Long]()
  private[graft] val bitsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Map[String, Long]]()

  /** Evict this session's memoized surprisal model (Cleanup.dropAll). */
  def dropModelCaches(s: SparkSession): Unit = {
    vocabCache.keySet.removeIf(_._1 eq s)
    bitsCache.keySet.removeIf(_._1 eq s)
  }

  def textSurprisal(s: SparkSession, d: String): DataFrame = {
    val maxVocab =
      s.conf.get("spark.graft.surprisal.maxVocab", "2000000").toLong
    val toks = documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
    // the bits map is the heavy entry (up to maxVocab string→long);
    // keep at most ONE dataset's model per session — switching datasets
    // evicts the previous model instead of pinning both for the
    // session's lifetime
    bitsCache.keySet.removeIf(k => (k._1 eq s) && k._2 != d)
    vocabCache.keySet.removeIf(k => (k._1 eq s) && k._2 != d)
    val nVocab: Long = vocabCache.computeIfAbsent((s, d),
      _ => toks.agg(approx_count_distinct(col("tok"))).head().getLong(0))
    val words = split(col("text"), " ")
    if (nVocab <= maxVocab) {
      val bits = bitsCache.computeIfAbsent((s, d), _ => {
        val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("n")).collect()
          .map(r => r.getString(0) -> r.getLong(1))
        val total = freq.map(_._2).sum
        freq.map { case (t, n) =>
          t -> (63 - java.lang.Long.numberOfLeadingZeros(total / n)).toLong
        }.toMap
      })
      val bitsMap = typedlit(bits)
      graft.Tables.spread(documents(s, d))
        .select(
          col("doc_id"),
          size(words).as("n_toks"),
          aggregate(transform(words, w => element_at(bitsMap, w)),
            lit(0L), (acc, v) => acc + v).as("surprisal_bits"))
        .withColumn("bits_per_tok_x100",
          expr("(surprisal_bits * 100) div n_toks"))
    } else textSurprisalJoined(s, d)
  }

  /** The over-threshold physical form, as its own gate entry
    * (`text_surprisal_joined`, same oracle as `text_surprisal` — the
    * join_bbox_grid_local pattern: both physical forms stay
    * hash-checked): ⌊log2(total DIV n)⌋ as binary-digit length
    * (integer-exact, same value as the numberOfLeadingZeros form in
    * the literal path), token bits from an explode + join on token,
    * per-document re-aggregation. Zero driver state. */
  def textSurprisalJoined(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
    val words = split(col("text"), " ")
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val total = freq.agg(sum(col("n")).as("total"))
    val bits = freq.crossJoin(broadcast(total))
      .select(col("tok"),
        (length(bin(expr("total DIV n"))) - 1).cast(LongType).as("tbits"))
    graft.Tables.spread(documents(s, d))
      .select(col("doc_id"), size(words).as("n_toks"),
        explode(words).as("tok"))
      .join(bits, "tok")
      .groupBy(col("doc_id"), col("n_toks"))
      .agg(sum(col("tbits")).as("surprisal_bits"))
      .select(col("doc_id"), col("n_toks"), col("surprisal_bits"),
        expr("(surprisal_bits * 100) div n_toks").as("bits_per_tok_x100"))
  }

  /** Single-pass column profile — the data-quality pass a pipeline
    * runs before training: row/null counts, class cardinalities,
    * length distribution. Everything is algebraic (partial agg
    * map-side; the shuffle carries one state). The two exact
    * `countDistinct`s are deliberate: lang/source are low-cardinality
    * class columns; a high-cardinality column would use the mergeable
    * `approx_count_distinct` (see agg_approx_distinct) instead. */
  def profileDocs(s: SparkSession, d: String): DataFrame =
    graft.Tables.spread(documents(s, d)).agg(
      count(lit(1)).as("n_rows"),
      count(col("text")).as("n_text"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      sum(length(col("text"))).as("total_chars"),
      avg(col("n_chars")).cast("double").as("avg_chars"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_heavy_hitters" -> aggHeavyHitters _,
    "text_pii_scrub" -> textPiiScrub _,
    "profile_table" -> profileDocs _,
    "text_langid" -> textLangid _,
    "text_quality" -> textQuality _,
    "text_normalize" -> textNormalize _,
    "text_tokens" -> textTokens _,
    "text_fingerprint" -> textFingerprint _,
    "text_repetition" -> textRepetition _,
    "text_surprisal" -> textSurprisal _,
    "text_surprisal_joined" -> textSurprisalJoined _
  )

  private def duckScore(l: String, ws: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), w -> w IN (${ws.map("'" + _ + "'").mkString(",")}))) AS s_$l"

  private val duckPred: String = {
    val langs = stopwords.map(_._1)
    val whens = langs.init.zipWithIndex.map { case (l, i) =>
      val conds = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${langs.last}' END"
  }

  private val surprisalOracleSql: String =
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |f AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
      |tt AS (SELECT count(*) AS total FROM t),
      |s AS (SELECT tok, CAST(floor(log2(total // n)) AS BIGINT) AS bits FROM f, tt)
      |SELECT doc_id, count(*) AS n_toks,
      |  CAST(sum(bits) AS BIGINT) AS surprisal_bits,
      |  CAST(sum(bits) * 100 AS BIGINT) // count(*) AS bits_per_tok_x100
      |FROM t JOIN s USING (tok)
      |GROUP BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // exact ground truth: the sketch pass only proposes candidates,
    // the engine's second pass re-counts them exactly
    "agg_heavy_hitters" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT source, tok, count(*) AS n FROM t GROUP BY source, tok)
        |SELECT source, tok, n, rnk FROM (
        |  SELECT source, tok, n, row_number() OVER (PARTITION BY source
        |    ORDER BY n DESC, tok ASC) AS rnk FROM cnt) x
        |WHERE rnk <= 10""".stripMargin,
    "text_pii_scrub" ->
      s"""WITH dirty AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com or 555-'
        |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |      || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0')
        |      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
        |      || CAST(doc_id * 3 % 256 AS VARCHAR) AS t
        |  FROM documents),
        |scrubbed AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(t, '$EmailRe')) AS n_email,
        |    len(regexp_extract_all(t, '$Ipv4Re')) AS n_ip,
        |    len(regexp_extract_all(t, '$PhoneRe')) AS n_phone,
        |    regexp_replace(regexp_replace(regexp_replace(t,
        |      '$EmailRe', '[EMAIL]', 'g'), '$Ipv4Re', '[IP]', 'g'),
        |      '$PhoneRe', '[PHONE]', 'g') AS scrubbed
        |  FROM dirty)
        |SELECT doc_id, n_email, n_ip, n_phone, scrubbed,
        |  len(regexp_extract_all(scrubbed, '$EmailRe'))
        |    + len(regexp_extract_all(scrubbed, '$Ipv4Re'))
        |    + len(regexp_extract_all(scrubbed, '$PhoneRe')) AS n_residual
        |FROM scrubbed""".stripMargin,
    "profile_table" ->
      """SELECT count(*) AS n_rows, count(text) AS n_text,
        |  count(DISTINCT lang) AS n_langs,
        |  count(DISTINCT source) AS n_sources,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  CAST(avg(n_chars) AS DOUBLE) AS avg_chars
        |FROM documents""".stripMargin,
    "text_langid" ->
      s"""WITH scored AS (
        |  SELECT doc_id, lang,
        |    ${stopwords.map { case (l, ws) => duckScore(l, ws) }.mkString(",\n    ")}
        |  FROM documents)
        |SELECT doc_id, lang, s_en, s_es, s_de, s_fr, s_zh,
        |  $duckPred AS lang_pred,
        |  ($duckPred) = lang AS is_match
        |FROM scored""".stripMargin,
    "text_quality" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    length(text) AS n_chars_m,
        |    len(string_split(text, ' ')) AS n_words,
        |    len(list_distinct(string_split(text, ' '))) AS n_uniq,
        |    length(replace(text, ' ', '')) * 100 // len(string_split(text, ' ')) AS avg_wlen_x100,
        |    len(list_filter(string_split(text, ' '),
        |        w -> w IN ('the','and','of','to','a'))) AS stop_hits
        |  FROM documents)
        |SELECT *, n_uniq * 100 // n_words AS uniq_pct,
        |  n_words >= 20 AND n_words <= 200 AND (n_uniq * 100 // n_words) >= 30 AS is_quality
        |FROM q""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm_text,
        |  regexp_replace(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), '[^a-z0-9 ]', '', 'g') AS norm_alnum,
        |  md5(regexp_replace(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), '[^a-z0-9 ]', '', 'g')) AS norm_hash
        |FROM documents""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+')) AS alpha_tokens,
        |  len(regexp_extract_all(text, '[0-9]+')) AS num_tokens,
        |  len(regexp_extract_all(text, '[a-z]{1,4}')) AS subword_tokens,
        |  length(text) AS n_chars_calc
        |FROM documents""".stripMargin,
    // floor(log2(k)) of an integer ratio == the Scala side's
    // 63 - numberOfLeadingZeros(k); sum(BIGINT) promotes to HUGEINT in
    // DuckDB, hence the terminal BIGINT casts (round-1 boundary rule)
    // (shared text: see surprisalOracleSql below the map)
    "text_surprisal" -> surprisalOracleSql,
    // both physical forms answer the same question — identical oracle
    // (the join_bbox_grid_local pattern)
    "text_surprisal_joined" -> surprisalOracleSql,
    "text_repetition" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    [array_to_string(string_split(text,' ')[i:i+1], ' ')
        |     FOR i IN range(1, len(string_split(text,' ')))] AS grams
        |  FROM documents WHERE len(string_split(text,' ')) >= 2),
        |s AS (
        |  SELECT doc_id, len(grams) AS n_grams,
        |    len(list_distinct(grams)) AS n_uniq_grams,
        |    list_max(list_transform(list_distinct(grams),
        |      g -> len(list_filter(grams, x -> x = g)))) AS max_gram_n
        |  FROM g)
        |SELECT doc_id, n_grams, n_uniq_grams, max_gram_n,
        |  (n_grams - n_uniq_grams) * 100 // n_grams AS dup_gram_pct,
        |  max_gram_n * 100 // n_grams AS top_gram_pct,
        |  ((n_grams - n_uniq_grams) * 100 // n_grams) >= 10
        |    OR (max_gram_n * 100 // n_grams) >= 8 AS is_repetitive
        |FROM s""".stripMargin,
    "text_fingerprint" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    list_min([substr(md5(array_to_string(string_split(text,' ')[i:i+4], ' ')), 1, 16)
        |      FOR i IN range(1, len(string_split(text,' ')) - 3)]) AS fingerprint
        |  FROM documents WHERE len(string_split(text,' ')) >= 5)
        |SELECT doc_id, fingerprint,
        |  count(*) OVER (PARTITION BY fingerprint) AS cluster_n
        |FROM f""".stripMargin
  )
}
