package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._
import graft.functions.BloomMightContain

/** Runtime Bloom-filter join pruning — the shuffle-volume lever for
  * selective fact⋈fact semi-joins at 100 TB.
  *
  * The broadcast-hash join covers build sides up to ~100 MB; beyond
  * that Spark shuffles BOTH sides, and the probe side's shuffle is
  * priced at full table volume even when only a few percent of its
  * rows can possibly match. The standard fix (Spark's own
  * `InjectRuntimeFilter`, Delta/Iceberg bloom skipping) is a Bloom
  * filter of the build keys probed UNDER the probe side's Exchange:
  * ~10 bits per key (1% fpp) means a 100M-key build side costs a
  * ~120 MB filter — broadcastable where its hash relation is not —
  * and every pruned row is a row that never enters the wire.
  *
  * Contract: the exact join stays downstream, so false positives are
  * dropped there and the result is bit-identical to the plain join —
  * the filter changes WHERE rows die (scan stage vs post-shuffle),
  * never the answer. That makes the gate oracle the plain SQL join.
  *
  * Build is `DataFrame.stat.bloomFilter` — a distributed
  * treeAggregate whose driver-side result is the filter bits, not
  * data (bounded by the fpp budget, documented at each call site).
  */
object BloomJoin {

  /** Exact-decimal view (see Relational: decimal before aggregation
    * keeps distributed sums order-independent AND oracle-exact). */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private def outD(c: Column): Column = c.cast(DoubleType)

  /** Serialized Bloom filter of `build`'s BIGINT `key` column.
    * Two cheap jobs over the (already-selective) build side: an exact
    * count to size the bits honestly, then the filter aggregation —
    * at cluster scale the count comes from table/column stats instead.
    * Driver holds only the filter bits: ~1.2 MB per million keys at
    * 1% fpp. */
  def buildBloom(build: DataFrame, key: String, fpp: Double = 0.01): Array[Byte] = {
    val n = math.max(build.count(), 1L)
    val bf = build.stat.bloomFilter(key, n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `probe` semi-joined to `build`, with the Bloom prefilter applied
    * below the probe side's shuffle. The merge hint pins the shuffled
    * join shape this operator exists for (an AQE broadcast at demo
    * scale would hide the pruning point the plan audit asserts). */
  def semiJoinBloom(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      fpp: Double = 0.01): DataFrame = {
    val bits = buildBloom(build.select(buildKey), buildKey, fpp)
    probe
      .filter(BloomMightContain.mightContain(bits, col(probeKey)))
      .join(build.hint("merge"), col(probeKey) === col(buildKey), "left_semi")
  }

  /** Gate query: lineitem pruned by a Bloom of the selective orders
    * subset's keys, exact semi-join after, then the usual exact-decimal
    * rollup. ~14% of probe rows survive the prefilter (+1% fpp), so
    * the probe-side Exchange carries ~7× fewer rows — measured per SF
    * in BLOOM_r10.json (BloomProbe). */
  def joinBloomPrefilter(s: SparkSession, d: String): DataFrame = {
    val sel = orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0)
      .select(col("o_orderkey"))
    semiJoinBloom(lineitem(s, d), sel, "l_orderkey", "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        outD(sum(dec(col("l_quantity")))).as("sum_qty"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_bloom_prefilter" -> joinBloomPrefilter _)

  val oracles: Map[String, String] = Map(
    "join_bloom_prefilter" ->
      """SELECT
        |  l_returnflag,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0)
        |GROUP BY l_returnflag
        |""".stripMargin)
}
