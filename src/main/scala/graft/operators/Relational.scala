package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables._

/** Core relational operator surface (SURVEY.md §2a–§2g).
  *
  * Re-expresses the reference's query surface (ToeBee/ChangesetMD
  * `README.md:106-124`, `queries.py:41-56`) as declarative DataFrame
  * plans so Catalyst gets full freedom: predicate pushdown + column
  * pruning reach the parquet scan, small dimensions are broadcast,
  * aggregates run partial+final, top-k lowers to
  * TakeOrderedAndProject.
  *
  * Numeric discipline for oracle parity: money/quantity doubles are
  * cast to DECIMAL before any aggregation, so Spark and DuckDB do
  * bit-identical exact arithmetic regardless of summation order —
  * which is also the right call at 100 TB, where float sums are
  * nondeterministic across partitionings.
  */
object Relational {

  /** Exact-decimal view of a 2-decimal double column. */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Output-boundary canonicalization: internal arithmetic stays exact
    * DECIMAL (order-independent at any partitioning), but the *final*
    * representation is DOUBLE — an exact decimal below 2^53 converts to
    * the identical IEEE double in every engine, so the driver's
    * normalizer sees one rendering instead of two decimal dialects.
    * Every oracle mirrors this with a terminal CAST(... AS DOUBLE). */
  private def outD(c: Column): Column = c.cast(DoubleType)

  // ---- §2a scans -----------------------------------------------------

  /** Columnar scan with pushed filter + pruned columns: the Postgres
    * heap-scan analog (`README.md:110-124`). `.explain` shows
    * PushedFilters + 3-column ReadSchema. */
  def scanParquet(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1998-06-01").cast(TimestampType))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  // ---- §2b projection / casts / filters ------------------------------

  /** Attribute projection with renames — the XML-attribute projection
    * step (`changesetmd.py:108-113`) re-expressed over the test table. */
  def projectAttrs(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_custkey").as("cust_id"),
      col("c_name").as("cust_name"),
      col("c_mktsegment").as("segment"))

  /** Explicit string/number/temporal casts — the reference relies on
    * Postgres wire-coercion (`queries.py:8-18`); here every cast is a
    * visible plan node. */
  def castTypes(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      col("l_orderkey"),
      col("l_linenumber"),
      col("l_quantity").cast(IntegerType).as("qty_int"),
      outD(dec(col("l_extendedprice"))).as("price_dec"),
      col("l_shipdate").cast(DateType).as("ship_day"),
      col("l_orderkey").cast(StringType).as("key_str"),
      (col("l_returnflag") === "R").as("is_return"))

  /** Equality + range + null-sensitive predicates (`queries.py:43-45`
    * index targets; nullability contract `README.md:95`). */
  def filterPred(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderstatus") === "F" &&
        col("o_totalprice").between(1000.0, 50000.0) &&
        col("o_orderpriority").isNotNull &&
        col("o_orderdate") < lit("1999-01-01").cast(TimestampType))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  // ---- §2c joins -----------------------------------------------------

  /** Fact⋈fact equi-join (changeset⋈comments analog, `README.md:99`):
    * shuffled hash / sort-merge, chosen by Catalyst + AQE. */
  def joinInnerHash(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        outD(sum(dec(col("l_extendedprice")))).as("sum_price"))

  /** Star join through two explicitly-broadcast dimensions — at 100 TB
    * the fact side never shuffles for dims this small. */
  def joinBroadcast(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_cust"), outD(sum(dec(col("c_acctbal")))).as("sum_bal"))

  /** Left outer join preserving parents with no children. */
  def joinLeft(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(
        lineitem(s, d).filter(col("l_quantity") >= 45.0),
        col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy(col("o_orderkey"))
      .agg(count(col("l_linenumber")).as("n_big_items"))

  /** Semi join: EXISTS — customers having ≥1 order. */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  /** Anti join: NOT EXISTS — also the engine primitive under upsert
    * (`changesetmd.py:71-76` delete+insert ≙ anti-join+union).
    * The build side is filtered (no order above 300k) so the result
    * is non-empty AND non-total: both the drop and keep branches of
    * the anti-join are exercised (the unfiltered form matched every
    * customer and passed vacuously on 0 rows). */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Skew-mitigated join: `l_returnflag` has 3 values over the whole
    * fact table (a pathological hot key). Salting spreads each hot key
    * over 16 shuffle partitions: the fact side gets a derived salt,
    * the dimension is replicated ×16, and the join key becomes
    * (key, salt). Same result as the plain join — the oracle IS the
    * plain join — but no reducer receives a whole hot key. (AQE skew
    * split handles moderate skew automatically; explicit salting is
    * the heavy-artillery version for single-key hot spots.) */
  def joinSkewSalted(s: SparkSession, d: String): DataFrame = {
    val salts = 16
    val flagDim = s.createDataFrame(
      java.util.Arrays.asList(
        Row("R", "returned"), Row("A", "accepted"), Row("N", "none")),
      StructType(Seq(StructField("flag", StringType, false),
        StructField("flag_desc", StringType, false))))
    val dimSalted = flagDim.crossJoin(
      s.range(salts).select(col("id").cast(IntegerType).as("salt")))
    val factSalted = lineitem(s, d)
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(salts)))
    factSalted.join(dimSalted,
        factSalted("l_returnflag") === dimSalted("flag") &&
        factSalted("salt") === dimSalted("salt"))
      .groupBy(col("flag_desc"))
      .agg(count(lit(1)).as("n"), outD(sum(dec(col("l_extendedprice")))).as("sum_price"))
  }

  /** Co-located (bucketed) fact-fact join — the zero-shuffle FK-join
    * layout SCALING.md prescribes for changesets⋈comments at 100 TB:
    * both sides written `bucketBy(8, key)` + sorted, so the join plans
    * with NO exchange on either input (asserted by PlanAudit and
    * BucketedJoinSpec); only the final small aggregation shuffles.
    * Same result as join_inner_hash — bucketing is a layout choice,
    * not a semantic one. */
  def joinBucketed(s: SparkSession, d: String): DataFrame = {
    val (ot, lt) = buildBucketedTables(s, d)
    joinBucketedOn(s, ot, lt)
  }

  /** One-time bucketed layout build (the ETL half — at 100 TB this is
    * the table's write-time layout, not per-query work). Returns the
    * registered table names; `joinBucketedOn` is the read-only query
    * half, which the bench times separately. */
  def buildBucketedTables(s: SparkSession, d: String): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_bkt")
    val tag = wh.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "_")
    val (ot, lt) = (s"orders_$tag", s"lineitem_$tag")
    orders(s, d).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", wh.resolve("orders").toString).saveAsTable(ot)
    lineitem(s, d).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", wh.resolve("lineitem").toString).saveAsTable(lt)
    (ot, lt)
  }

  def joinBucketedOn(s: SparkSession, ot: String, lt: String): DataFrame =
    s.table(ot)
      .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        outD(sum(dec(col("l_extendedprice")))).as("sum_price"))

  /** As-of join — each click matched to the MOST RECENT purchase by
    * the same user at or before its timestamp. Spark has no asof
    * operator; the scalable composition (per the custom-operator
    * preference order: compose existing ops first) is union-then-
    * window: tag both sides, sort each user's timeline once, and let
    * `last(_, ignoreNulls)` carry the latest state values forward.
    * ONE hash shuffle by user_id + a per-partition sort — no join
    * machinery, no per-event probe, and at 100 TB no risk of the
    * range-join blowup a theta `ts >= ts` join would plan. Equal
    * timestamps sort state-first, matching ASOF's `>=`; purchases are
    * last-wins deduped per (user, ts) so the match is deterministic.
    * The DuckDB oracle is the genuinely independent check: its native
    * ASOF JOIN (a different algorithm entirely) must produce the
    * identical relation. */
  def joinAsof(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val pw = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(pw)).filter(col("rn") === 1)
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), dec(col("value")).as("p_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val tagged = purchases
      .select(col("user_id"), col("ts"), lit(1).as("is_state"),
        col("p_event_id"), col("p_value"), lit(null).cast(LongType).as("event_id"))
      .unionByName(clicks
        .select(col("user_id"), col("ts"), lit(0).as("is_state"),
          lit(null).cast(LongType).as("p_event_id"),
          lit(null).cast(DecimalType(12, 2)).as("p_value"), col("event_id")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_state").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("m_event", last(col("p_event_id"), ignoreNulls = true).over(w))
      .withColumn("m_ts",
        last(when(col("is_state") === 1, col("ts")), ignoreNulls = true).over(w))
      .withColumn("m_value", last(col("p_value"), ignoreNulls = true).over(w))
      .filter(col("is_state") === 0 && col("m_event").isNotNull)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"), col("m_event").as("purchase_id"),
        col("m_ts").as("purchase_ts"), outD(col("m_value")).as("p_value"))
  }

  // ---- §2d aggregations ----------------------------------------------

  /** COUNT(*) vs COUNT(col) (null-skipping) — `README.md:110-112`. */
  def aggCount(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_discount") > 0.05)
      .agg(count(lit(1)).as("n_rows"), count(col("l_orderkey")).as("n_keys"))

  /** Integer-cents view of a 2-decimal double column — the
    * codegen-friendly LongType twin of `dec` (r18, guide §4/§2.3
    * narrower types). For every double whose shortest decimal
    * representation has ≤ 2 fraction digits (ALL money/quantity values
    * in the driver's data universe — audited per-column across every
    * tier, 0 mismatches; DecimalCentsSpec pins the equivalence
    * exhaustively and re-audits the corpus), x·100 lands within ~2⁻²⁰
    * of the integer cents k, so ⌊x·100 + 0.5⌋ recovers k exactly —
    * pure double arithmetic, no per-row BigDecimal (both CAST(x AS
    * DECIMAL) and round(x, n) allocate one per row), and the
    * aggregation buffer becomes a primitive long instead of the
    * 22-digit Decimal that falls off UnsafeRow's fixed-width fast
    * path. NOT valid for 3+-decimal inputs (0.615 would round
    * differently) — that is a property of the data contract, enforced
    * by the spec's corpus audit, not assumed. */
  private[graft] def cents(c: Column): Column =
    floor(c * 100 + 0.5).cast(LongType)

  /** Output-boundary for cents-scaled long sums: route through
    * DECIMAL so the emitted double is the correctly rounded value of
    * the exact rational sum/10^s at any magnitude (a double division
    * would double-round past 2⁵³), matching `outD(sum(dec(...)))`
    * bit-for-bit. One division per GROUP, not per row. */
  private def centsOutD(c: Column, divisor: Long): Column =
    (c.cast(DecimalType(38, 0)) / lit(divisor)).cast(DoubleType)

  /** Grouped rollup (TPC-H Q1 shape): hash aggregate with map-side
    * partial aggregation; exact long-cents sums (r18 — bit-identical
    * output to the decimal-sum reference below, which remains the
    * 100 TB-safe form: the x10000 product sum here overflows Long
    * at ~2×10¹⁰ max-priced rows PER GROUP, four orders above the
    * driver's largest tier but reachable by an extreme deployment). */
  def aggGroup(s: SparkSession, d: String): DataFrame = {
    val df = lineitem(s, d)
    val qty = cents(col("l_quantity"))
    val ep = cents(col("l_extendedprice"))
    val disc = cents(col("l_discount"))
    df.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        centsOutD(sum(qty), 100L).as("sum_qty"),
        centsOutD(sum(ep), 100L).as("sum_base_price"),
        centsOutD(sum(ep * (lit(100L) - disc)), 10000L).as("sum_disc_price"),
        count(lit(1)).as("n_rows"),
        centsOutD(min(qty), 100L).as("min_qty"),
        centsOutD(max(qty), 100L).as("max_qty"))
  }

  /** The pre-r18 exact-decimal form of aggGroup — kept as the
    * oracle-parity reference DecimalCentsSpec bit-compares against,
    * and the form a 100 TB deployment outside the long-cents overflow
    * envelope should run. */
  private[graft] def aggGroupDecimalRef(s: SparkSession, d: String): DataFrame = {
    val df = lineitem(s, d)
    df.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        outD(sum(dec(col("l_quantity")))).as("sum_qty"),
        outD(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        outD(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount")))))
          .as("sum_disc_price"),
        count(lit(1)).as("n_rows"),
        outD(min(dec(col("l_quantity")))).as("min_qty"),
        outD(max(dec(col("l_quantity")))).as("max_qty"))
  }

  /** Exact distinct counts per group (`queries.py:43-44` editors). */
  def aggDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"))

  /** Sketch-based distinct (HLL++) — the 100 TB-scale variant of
    * aggDistinct. Approximate by design, so the oracle-checkable
    * surface is the exact count plus a checked error bound: HLL++ at
    * rsd=0.01 must land within 5% of the exact distinct (it lands
    * within ~1%); `approx_ok` makes a wrong sketch fail the gate. */
  def aggApproxDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_part"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx"))
      .select(col("l_returnflag"), col("n_part"),
        (abs(col("approx") - col("n_part")) <=
          col("n_part") * lit(0.05)).as("approx_ok"))

  /** Exact interpolated percentiles (median / p90) per group — the
    * distribution-shape summary the reference's per-user rollups
    * imply; at 100 TB swap to approx_percentile (t-digest-like
    * mergeable sketch) exactly as agg_distinct ↔ approx_count_distinct. */
  def aggPercentile(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("med"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))

  /** Sketch-based percentile (QuantileSummaries / Greenwald-Khanna —
    * mergeable, constant state, map-side partials): the 100 TB
    * counterpart of aggPercentile, gated like aggApproxDistinct by the
    * exact value plus a checked error bound (the sketch's merge order
    * varies with partitioning, so the *bound* is the stable fact). */
  def aggApproxPercentile(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("med"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("approx"))
      .select(col("o_orderpriority"), col("med"),
        (abs(col("approx") - col("med")) <= col("med") * lit(0.05)).as("approx_ok"))

  /** ROLLUP: multi-granularity summary (region→nation→total). */
  def aggRollup(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), outD(sum(dec(col("c_acctbal")))).as("sum_bal"))

  /** CUBE over two independent dimensions. */
  def aggCube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), outD(sum(dec(col("o_totalprice")))).as("sum_price"))

  // ---- §2e windows ---------------------------------------------------

  /** Last-writer-wins dedup — the replication upsert semantics
    * (`changesetmd.py:105-106`) as a window: one shuffle on the key,
    * no join. */
  def winDedupLastwins(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), outD(dec(col("value"))).as("last_value"))
  }

  /** rank() per partition with deterministic tiebreak: top editors
    * analog (`queries.py:43-45`). */
  def winRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    customer(s, d)
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 5)
      .select(col("c_mktsegment"), col("c_custkey"), outD(dec(col("c_acctbal"))).as("bal"), col("rnk"))
  }

  /** lag(): inter-event gap per user in exact microseconds. */
  def winLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .select(
        col("user_id"), col("event_id"),
        (unix_micros(col("ts")) - col("prev_us")).as("gap_us"))
  }

  /** Batch sessionization — the batch analog of
    * stream_session_window: a session break is a ≥ 30-min gap from
    * the previous event (lag), and the session ordinal is the running
    * count of breaks (cumulative sum) — the classic two-window
    * composition. The second window consumes the first's output so
    * Catalyst plans two Window nodes, but they share ONE shuffle and
    * ONE per-partition sort (verified: 1 Exchange, 1 Sort in the
    * executed plan) — the second pass reuses the partitioning and
    * ordering. Deterministic via the event_id tie-break. */
  def winSessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_break",
        when(col("gap_us").isNull || col("gap_us") > 30L * 60 * 1000000, 1).otherwise(0))
      .withColumn("session_seq", sum(col("is_break")).over(run))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("session_seq").cast(LongType).as("session_seq"))
  }

  /** RANGE frame: for every order, aggregate over the *value range*
    * (±3 days of order date per customer), not a row count — the
    * frame-spec coverage of §2e (`rangeBetween`). */
  def winRangeFrame(s: SparkSession, d: String): DataFrame = {
    val days = datediff(col("o_orderdate").cast(DateType), lit("1995-01-01").cast(DateType))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_no"))
      .rangeBetween(-3, 3)
    orders(s, d)
      .withColumn("day_no", days)
      .select(col("o_orderkey"), col("o_custkey"), col("day_no"),
        count(lit(1)).over(w).as("n_near"),
        outD(sum(dec(col("o_totalprice"))).over(w)).as("sum_near"))
  }

  /** Running totals (cumulative frame) — the loader's cumulative
    * rows/sec progress metric (`changesetmd.py:115-117`) as a window. */
  def aggRunningRate(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d).select(
      col("event_type"), col("event_id"),
      count(lit(1)).over(w).as("n_so_far"),
      outD(sum(dec(col("value"))).over(w)).as("value_so_far"))
  }

  // ---- §2f sorts / top-k / set ops -----------------------------------

  /** Global sequence ordering — replication diffs applied in strict
    * ascending order (`changesetmd.py:181-186`). Dense global
    * numbering WITHOUT the single-partition window: two-pass
    * range-bucketed numbering. The buckets are DERIVED (equal-width
    * slices of the [min ts, max ts] span — one bounded agg), not
    * sampled by repartitionByRange: the bucket of a row is a pure
    * function of its sort key, so no cache is needed to pin a
    * nondeterministic partitioning across the two passes (the r6
    * packSequences fix — its sampled sibling here leaked an
    * InMemoryRelation across gate invocations). Pass 1 counts rows
    * per bucket (a driver-side collect bounded by #buckets); pass 2
    * adds each bucket's cumulative offset to its per-bucket
    * row_number. The bucket function is monotone in (ts, event_id),
    * so bucket-then-(ts, event_id) is the global total order and the
    * numbering is dense — same output as `Window.orderBy(...)` with
    * no stage through which the whole table funnels. When the ts span
    * is too narrow to cut into nb slices (the single-timestamp
    * corpus), the bucket derives from the TIEBREAKER too:
    * tsOffset·nb + event_id-slice — still monotone (the ts term
    * strides past every tiebreaker slice) and at most nb² bucket ids,
    * so a corpus concentrated in one timestamp spreads over nb tasks
    * instead of collapsing into one (the hot-cell-tiling refinement,
    * applied to sort keys). A null ts gets its own bucket below every
    * real one, matching the NULLS FIRST placement of
    * `Window.orderBy(ts.asc)` (`least()` would skip the null and
    * silently number those rows last).
    *
    * SKEW within a wide span (one hot second in a year of data) gets
    * the same treatment recursively: pass 1's counts — already
    * collected for the offsets — flag buckets holding > 4× their fair
    * share; one more bounded agg fetches each hot bucket's own
    * [min ts, max ts], and the refined bucket id bkt·nb + sub
    * re-slices ONLY the hot buckets (finer ts slices when the hot
    * bucket spans more than one timestamp, event_id slices — the
    * tiebreaker — when it is a single timestamp, which finer ts can
    * never split). The composite stays monotone in (ts, event_id)
    * because the coarse term strides past every sub-slice; cold
    * buckets pay nothing and the extra pass happens only when skew
    * is detected. */
  def sortSeq(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("ts"), col("event_id"), col("user_id"))
    val span = e.agg(
      min(unix_micros(col("ts"))), max(unix_micros(col("ts"))),
      min(col("event_id")), max(col("event_id"))).head()
    if (span.isNullAt(2)) // empty input (event_id is the non-null key)
      return e.select(lit(0L).as("seq"), col("event_id"), col("user_id")).limit(0)
    val nb = s.conf.get("spark.sql.shuffle.partitions").toInt
    val (mn, mx) =
      if (span.isNullAt(0)) (0L, 0L) else (span.getLong(0), span.getLong(1))
    val (emn, emx) = (span.getLong(2), span.getLong(3))
    val tsSpan = math.max(mx - mn + 1, 1L)
    val eidB = expr(s"least(${nb - 1}, CAST((event_id - ${emn}L) * $nb " +
      s"DIV ${math.max(emx - emn + 1, 1L)}L AS INT))")
    val tsBucket =
      if (tsSpan < nb)
        expr(s"CAST(unix_micros(ts) - ${mn}L AS INT)") * lit(nb.toInt) + eidB
      else
        expr(s"least(${nb - 1}, CAST((unix_micros(ts) - ${mn}L) * $nb " +
          s"DIV ${tsSpan}L AS INT))")
    val bucket0 = when(col("ts").isNull, lit(-1)).otherwise(tsBucket)
    var bucket = bucket0
    var counts = e.select(bucket0.as("bkt")).groupBy(col("bkt")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // ---- skew refinement (wide span only; the narrow path is already
    // tiebreaker-composite) --------------------------------------------
    if (tsSpan >= nb) {
      val total = counts.values.sum
      val hot = counts.filter(_._2 > 4L * math.max(total / nb, 1L)).keys.toSeq.sorted
      if (hot.nonEmpty) {
        val ranges = e.select(bucket0.as("bkt"), unix_micros(col("ts")).as("tsu"))
          .filter(col("bkt").isin(hot.map(Integer.valueOf): _*))
          .groupBy(col("bkt")).agg(min(col("tsu")), max(col("tsu"))).collect()
          .map(r => r.getInt(0) ->
            (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
        val sub = hot.foldLeft(lit(0)) { (acc, h) =>
          val hSub = ranges(h) match {
            case Some((hmn, hmx)) if hmx > hmn => // finer ts slices
              expr(s"least(${nb - 1}, CAST((unix_micros(ts) - ${hmn}L) * $nb " +
                s"DIV ${hmx - hmn + 1}L AS INT))")
            case _ => eidB // single timestamp (or all-null bucket): tiebreaker
          }
          when(bucket0 === h, hSub).otherwise(acc)
        }
        bucket = bucket0 * lit(nb) + sub
        counts = e.select(bucket.as("bkt")).groupBy(col("bkt")).count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      }
    }
    val bkts = counts.keys.toSeq.sorted
    val offsets = bkts.zip(bkts.scanLeft(0L)((acc, p) => acc + counts(p)).init)
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(
        map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*),
        col("bkt")), lit(0L))
    val wp = Window.partitionBy(col("bkt")).orderBy(col("ts").asc, col("event_id").asc)
    e.withColumn("bkt", bucket.as("bkt"))
      .withColumn("seq", row_number().over(wp) + offCol)
      .select(col("seq"), col("event_id"), col("user_id"))
  }

  /** True top-k: lowers to TakeOrderedAndProject (no global sort) —
    * the "largest changesets" query class. */
  def sortLimitTopk(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(15)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))

  /** UNION ALL of two homogeneous slices (weekly dump + deltas form
    * one logical table, `changesetmd.py:78`). */
  def setUnion(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_mktsegment"))
      .unionByName(
        c.filter(col("c_mktsegment") === "MACHINERY")
          .select(col("c_custkey"), col("c_mktsegment")))
  }

  /** EXCEPT (distinct): replication-audit shape — present here, absent
    * there (`changesetmd.py:179-183` semantics). */
  def setExcept(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      .except(o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey")))
  }

  /** INTERSECT (distinct). */
  def setIntersect(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      .intersect(o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey")))
  }

  // ---- §2g scalar functions ------------------------------------------

  /** String function coverage (prefix LIKE `README.md:118` etc.). */
  def fnString(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_custkey"),
      upper(col("c_name")).as("name_upper"),
      lower(col("c_mktsegment")).as("seg_lower"),
      length(col("c_name")).as("name_len"),
      substring(col("c_name"), 1, 8).as("name_pre"),
      concat(col("c_mktsegment"), lit("/"), col("c_name")).as("seg_name"),
      col("c_name").like("Customer%").as("is_cust"))

  /** Date/time function coverage (ISO parse + interval math,
    * `changesetmd.py:109-111,268-271`). */
  def fnDatetime(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey"),
      date_trunc("month", col("o_orderdate")).as("order_month"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dom"),
      datediff(col("o_orderdate").cast(DateType), lit("1995-01-01").cast(DateType)).as("days_since"),
      (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"))

  /** Math / formatting: the sequence→replication-path arithmetic
    * (`changesetmd.py:128-130`) over test keys. */
  def fnMath(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey"),
      floor(col("o_orderkey") / 1000000L).as("seq_a"),
      pmod(floor(col("o_orderkey") / 1000L), lit(1000L)).as("seq_b"),
      pmod(col("o_orderkey"), lit(1000L)).as("seq_c"),
      format_string("%03d/%03d/%03d",
        floor(col("o_orderkey") / 1000000L),
        pmod(floor(col("o_orderkey") / 1000L), lit(1000L)),
        pmod(col("o_orderkey"), lit(1000L))).as("seq_path"),
      abs(col("o_custkey") - 100L).as("abs_off"),
      sqrt(col("o_totalprice")).as("sqrt_price"))

  /** Regex scalar functions: extraction, replacement, matching —
    * the pattern toolbox behind quality filters and tag parsing. */
  def fnRegex(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_custkey"),
      regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
      regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
      col("c_name").rlike("^Customer#0*[0-9]+$").as("name_wellformed"))

  /** Hash functions: content addressing / partition keys (md5 feeds
    * the dedup family; sha256 the content-integrity path). */
  def fnHash(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_custkey"),
      md5(col("c_name")).as("name_md5"),
      sha2(col("c_name"), 256).as("name_sha256"))

  /** GROUPING SETS: the explicit multi-grouping generalization of
    * rollup/cube (SQL surface; Spark's DataFrame API exposes it via
    * SQL). */
  def aggGroupingSets(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  /** Conditional / null-handling (`.get(k, None)` defaulting,
    * `changesetmd.py:108-113`). */
  def fnConditional(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      when(col("l_returnflag") === "R", lit("returned"))
        .when(col("l_returnflag") === "A", lit("ack"))
        .otherwise(lit("none")).as("flag_desc"),
      outD(coalesce(nullif(dec(col("l_discount")), lit(0).cast(DecimalType(12, 2))),
        lit(-1).cast(DecimalType(12, 2)))).as("disc_or_neg1"),
      (col("l_tax") > col("l_discount")).as("tax_gt_disc"))

  // ---- registry ------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_parquet" -> scanParquet _,
    "project_attrs" -> projectAttrs _,
    "cast_types" -> castTypes _,
    "filter_pred" -> filterPred _,
    "join_inner_hash" -> joinInnerHash _,
    "join_broadcast" -> joinBroadcast _,
    "join_left" -> joinLeft _,
    "join_semi" -> joinSemi _,
    "join_anti" -> joinAnti _,
    "join_skew_salted" -> joinSkewSalted _,
    "join_bucketed" -> joinBucketed _,
    "join_asof" -> joinAsof _,
    "agg_count" -> aggCount _,
    "agg_group" -> aggGroup _,
    "agg_distinct" -> aggDistinct _,
    "agg_approx_distinct" -> aggApproxDistinct _,
    "agg_percentile" -> aggPercentile _,
    "agg_approx_percentile" -> aggApproxPercentile _,
    "agg_rollup" -> aggRollup _,
    "agg_cube" -> aggCube _,
    "win_dedup_lastwins" -> winDedupLastwins _,
    "win_rank" -> winRank _,
    "win_lag" -> winLag _,
    "win_sessionize" -> winSessionize _,
    "win_range_frame" -> winRangeFrame _,
    "agg_running_rate" -> aggRunningRate _,
    "sort_seq" -> sortSeq _,
    "sort_limit_topk" -> sortLimitTopk _,
    "set_union" -> setUnion _,
    "set_except" -> setExcept _,
    "set_intersect" -> setIntersect _,
    "fn_string" -> fnString _,
    "fn_datetime" -> fnDatetime _,
    "fn_math" -> fnMath _,
    "fn_conditional" -> fnConditional _,
    "fn_regex" -> fnRegex _,
    "fn_hash" -> fnHash _,
    "agg_grouping_sets" -> aggGroupingSets _
  )

  val oracles: Map[String, String] = Map(
    "scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-06-01'""".stripMargin,
    "project_attrs" ->
      "SELECT c_custkey AS cust_id, c_name AS cust_name, c_mktsegment AS segment FROM customer",
    "cast_types" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS INTEGER) AS qty_int,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
        |  CAST(l_shipdate AS DATE) AS ship_day,
        |  CAST(l_orderkey AS VARCHAR) AS key_str,
        |  l_returnflag = 'R' AS is_return
        |FROM lineitem""".stripMargin,
    "filter_pred" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice BETWEEN 1000.0 AND 50000.0
        |  AND o_orderpriority IS NOT NULL AND o_orderdate < TIMESTAMP '1999-01-01'""".stripMargin,
    "join_inner_hash" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "join_broadcast" ->
      """SELECT r_name, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "join_left" ->
      """SELECT o_orderkey, count(l_linenumber) AS n_big_items
        |FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 45.0) li
        |  ON o_orderkey = li.l_orderkey
        |GROUP BY o_orderkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "join_skew_salted" ->
      """SELECT f.flag_desc, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |JOIN (VALUES ('R','returned'),('A','accepted'),('N','none')) f(flag, flag_desc)
        |  ON l_returnflag = f.flag
        |GROUP BY f.flag_desc""".stripMargin,
    "join_bucketed" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    // independent algorithm on the oracle side: DuckDB's native ASOF
    // JOIN must equal the union+window composition
    "join_asof" ->
      """WITH p AS (
        |  SELECT user_id, ts, event_id AS p_event_id,
        |    CAST(value AS DECIMAL(12,2)) AS p_value
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |          ORDER BY event_id DESC) AS rn
        |        FROM events WHERE event_type = 'purchase') t
        |  WHERE rn = 1),
        |c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
        |SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
        |  p.p_event_id AS purchase_id, p.ts AS purchase_ts,
        |  CAST(p.p_value AS DOUBLE) AS p_value
        |FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "agg_count" ->
      """SELECT count(*) AS n_rows, count(l_orderkey) AS n_keys
        |FROM lineitem WHERE l_discount > 0.05""".stripMargin,
    "agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS n_rows,
        |  CAST(min(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS min_qty,
        |  CAST(max(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS max_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "agg_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_part,
        |  true AS approx_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "agg_percentile" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS med,
        |  quantile_cont(o_totalprice, 0.9) AS p90
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "agg_approx_percentile" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS med,
        |  true AS approx_ok
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "win_dedup_lastwins" ->
      """SELECT user_id, event_id, event_type,
        |  CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1""".stripMargin,
    "win_rank" ->
      """SELECT c_mktsegment, c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal, rnk
        |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
        |        rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
        |      FROM customer) t
        |WHERE rnk <= 5""".stripMargin,
    "win_lag" ->
      """SELECT user_id, event_id,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
        |FROM events""".stripMargin,
    "win_sessionize" ->
      """SELECT user_id, event_id, ts,
        |  CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |FROM (
        |  SELECT user_id, event_id, ts,
        |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS gap_us
        |  FROM events) t""".stripMargin,
    "win_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_no,
        |  count(*) OVER w AS n_near,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_near
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |  RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)""".stripMargin,
    "agg_running_rate" ->
      """SELECT event_type, event_id,
        |  count(*) OVER w AS n_so_far,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS value_so_far
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "sort_seq" ->
      """SELECT row_number() OVER (ORDER BY ts ASC, event_id ASC) AS seq,
        |  event_id, user_id
        |FROM events""".stripMargin,
    "sort_limit_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""".stripMargin,
    "set_union" ->
      """SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'MACHINERY'""".stripMargin,
    "set_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997""".stripMargin,
    "fn_string" ->
      """SELECT c_custkey,
        |  upper(c_name) AS name_upper,
        |  lower(c_mktsegment) AS seg_lower,
        |  length(c_name) AS name_len,
        |  substring(c_name, 1, 8) AS name_pre,
        |  c_mktsegment || '/' || c_name AS seg_name,
        |  c_name LIKE 'Customer%' AS is_cust
        |FROM customer""".stripMargin,
    "fn_datetime" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
        |  year(o_orderdate) AS y,
        |  month(o_orderdate) AS m,
        |  dayofmonth(o_orderdate) AS dom,
        |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |  o_orderdate + INTERVAL 30 DAY AS due_date
        |FROM orders""".stripMargin,
    "fn_math" ->
      """SELECT o_orderkey,
        |  CAST(floor(o_orderkey / 1000000) AS BIGINT) AS seq_a,
        |  CAST(floor(o_orderkey / 1000) AS BIGINT) % 1000 AS seq_b,
        |  o_orderkey % 1000 AS seq_c,
        |  printf('%03d/%03d/%03d', CAST(floor(o_orderkey / 1000000) AS BIGINT),
        |         CAST(floor(o_orderkey / 1000) AS BIGINT) % 1000, o_orderkey % 1000) AS seq_path,
        |  abs(o_custkey - 100) AS abs_off,
        |  sqrt(o_totalprice) AS sqrt_price
        |FROM orders""".stripMargin,
    "fn_conditional" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_returnflag = 'R' THEN 'returned'
        |       WHEN l_returnflag = 'A' THEN 'ack'
        |       ELSE 'none' END AS flag_desc,
        |  CAST(coalesce(nullif(CAST(l_discount AS DECIMAL(12,2)), CAST(0 AS DECIMAL(12,2))),
        |           CAST(-1 AS DECIMAL(12,2))) AS DOUBLE) AS disc_or_neg1,
        |  l_tax > l_discount AS tax_gt_disc
        |FROM lineitem""".stripMargin,
    "fn_regex" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
        |  regexp_matches(c_name, '^Customer#0*[0-9]+$') AS name_wellformed
        |FROM customer""".stripMargin,
    "fn_hash" ->
      """SELECT c_custkey,
        |  md5(c_name) AS name_md5,
        |  sha256(c_name) AS name_sha256
        |FROM customer""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin
  )
}
