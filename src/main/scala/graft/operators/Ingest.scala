package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import java.nio.file.Files
import graft.Tables._
import graft.sources.OsmXml

/** Ingest-side operator demonstrations (SURVEY.md §2a): XML scans,
  * compressed inputs, DDL lifecycle, post-load "index build".
  * The XML-world entries have no SQL oracle (the fixture is not a
  * parquet table the driver's DuckDB sees) → rows-only checks.
  */
object Ingest {

  /** Distributed XML scan of the bulk-dump fixture → changesets
    * relation joined with its exploded comments child relation
    * (EP1's extract step end-to-end). DECIMAL(10,7) coords are
    * canonicalized to DOUBLE at the query boundary (oracle-parity
    * rule; the relation itself stays decimal-typed). */
  def scanXml(s: SparkSession, d: String): DataFrame = {
    val p = Files.createTempDirectory("graft_xml").resolve("dump.osm.xml")
    OsmXml.writeFixture(p, OsmXml.bulkFixture)
    val raw = OsmXml.scan(s, p.toString)
    Seq("min_lat", "max_lat", "min_lon", "max_lon").foldLeft(
      OsmXml.changesets(raw)
        .withColumn("tags_json", to_json(col("tags"))).drop("tags")
    )((df, c) => df.withColumn(c, col(c).cast(DoubleType)))
  }

  /** Same scan through the gzip codec path (changesetmd.py:239-248);
    * returns the comments child relation. */
  def scanCompressed(s: SparkSession, d: String): DataFrame = {
    val p = Files.createTempDirectory("graft_xmlgz").resolve("dump.osm.xml.gz")
    OsmXml.writeFixture(p, OsmXml.bulkFixture)
    OsmXml.comments(OsmXml.scan(s, p.toString))
  }

  /** JSONL source — the line-delimited JSON export modern tooling
    * ships alongside XML dumps (same changeset shape, one object per
    * line). The schema is EXPLICIT: inference is a whole extra pass
    * over 100 TB and non-deterministic under sampling; a declared
    * schema also makes malformed rows a visible failure
    * (`columnNameOfCorruptRecord`) instead of a silent drop. JSON
    * lines split by newline, so the scan parallelizes like any text
    * source. Output canonicalized exactly like scanXml (timestamps,
    * DOUBLE coords, tags_json). */
  def scanJsonl(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val p = Files.createTempDirectory("graft_jsonl").resolve("changesets.jsonl")
    Files.writeString(p, Seq(
      """{"id":10,"uid":7,"user":"alice","created_at":"2015-11-15T22:00:01Z","closed_at":"2015-11-15T22:05:00Z","open":false,"num_changes":12,"min_lat":40.6884971,"max_lat":40.6911817,"min_lon":-74.0474545,"max_lon":-74.043399,"tags":{"comment":"fix buildings","created_by":"JOSM/1.5 (8339)"}}""",
      """{"id":11,"uid":8,"user":"bob","created_at":"2015-11-15T23:00:00Z","open":true,"tags":{}}""",
      """{"id":12,"uid":9,"user":"carol","created_at":"2015-11-15T23:30:00Z","closed_at":"2015-11-16T00:30:00Z","open":false,"num_changes":3,"min_lat":-95.0,"max_lat":91.0,"min_lon":-181.5,"max_lon":200.25,"tags":{"bot":"yes"}}"""
    ).mkString("", "\n", "\n"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("uid", LongType),
      StructField("user", StringType),
      StructField("created_at", TimestampType),
      StructField("closed_at", TimestampType),
      StructField("open", BooleanType),
      StructField("num_changes", IntegerType),
      StructField("min_lat", DoubleType), StructField("max_lat", DoubleType),
      StructField("min_lon", DoubleType), StructField("max_lon", DoubleType),
      StructField("tags", MapType(StringType, StringType))))
    s.read.schema(schema).json(p.toString)
      .select(col("id"), col("uid"), col("user"), col("created_at"),
        col("closed_at"), col("open"), col("num_changes"),
        col("min_lat"), col("max_lat"), col("min_lon"), col("max_lon"),
        to_json(col("tags")).as("tags_json"))
  }

  /** Nested-comment extraction from the bulk fixture: the
    * discussion→comment explode path (changesetmd.py:94-103) as its
    * own named operator. */
  def extractComments(s: SparkSession, d: String): DataFrame = {
    val p = Files.createTempDirectory("graft_xmlc").resolve("dump.osm.xml")
    OsmXml.writeFixture(p, OsmXml.bulkFixture)
    OsmXml.comments(OsmXml.scan(s, p.toString))
  }

  /** Offset→URL replication addressing (changesetmd.py:127-135) over
    * REAL HTTP: the fixture world is served by a loopback HTTP server,
    * `HttpSource` GETs `state.yaml` + each addressed diff
    * (`nnn/nnn/nnn.osm.gz`) and stages it atomically, and the
    * distributed scan reads the staged files — the same transport a
    * user points at the live planet feed. Returns one row per fetched
    * changeset with its source sequence. */
  def sourceHttpReplication(s: SparkSession, d: String): DataFrame = {
    val root = Files.createTempDirectory("graft_httprepl")
    val feed = root.resolve("feed")
    graft.streaming.Replication.writeFixtureWorld(feed, 4)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange =>
      val f = feed.resolve(exchange.getRequestURI.getPath.stripPrefix("/"))
      if (Files.isRegularFile(f)) {
        val bytes = Files.readAllBytes(f)
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
      } else exchange.sendResponseHeaders(404, -1L)
      exchange.close()
    })
    server.start()
    try {
      val src = graft.streaming.Replication.HttpSource(
        s"http://127.0.0.1:${server.getAddress.getPort}", root.resolve("staging"))
      val (serverSeq, _) = src.serverState()
      val staged = src.stage(1L to serverSeq) // fetched over the wire
      val bySeq = staged.zip(1L to serverSeq).map { case (path, seq) =>
        OsmXml.changesets(OsmXml.scan(s, path))
          .withColumn("seq", lit(seq))
          .withColumn("seq_path", lit(graft.streaming.Replication.sequencePath(seq)))
      }
      // staging already fetched every diff over the wire (eager GETs);
      // the lazy scan reads only the staged local copies, so the
      // server can stop before the query runs
      bySeq.reduce(_ unionByName _)
        .select(col("seq"), col("seq_path"), col("id"), col("num_changes"))
    } finally server.stop(0)
  }

  /** state.yaml discovery (changesetmd.py:167-171): driver-side scalar
    * read surfaced as a single-row relation. */
  def sourceStateYaml(s: SparkSession, d: String): DataFrame = {
    val dir = Files.createTempDirectory("graft_state")
    Files.writeString(dir.resolve("state.yaml"),
      "---\nlast_run: 2015-11-16 12:00:00.000000000 +00:00\nsequence: 1612345\n")
    val (seq, lastRun) = graft.streaming.Replication.readServerState(dir)
    s.range(1).select(lit(seq).as("sequence"), lit(lastRun).as("last_run"))
  }

  /** DDL create: register the parquet table in the catalog and query
    * it through SQL — the `CREATE TABLE` + catalog path
    * (queries.py:6-35) with no extension machinery. */
  def ddlCreate(s: SparkSession, d: String): DataFrame = {
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW lineitem_v AS " +
      s"SELECT * FROM parquet.`$d/lineitem.parquet`")
    s.sql("""SELECT l_returnflag, count(*) AS n FROM lineitem_v
             GROUP BY l_returnflag""")
  }

  /** DDL truncate (queries.py:37-39): overwrite-with-empty on a
    * scratch copy; reports row counts before/after. */
  def ddlTruncate(s: SparkSession, d: String): DataFrame = {
    val out = Files.createTempDirectory("graft_trunc").resolve("t").toString
    val ev = events(s, d)
    ev.write.parquet(out)
    val before = s.read.parquet(out).count()
    ev.limit(0).write.mode("overwrite").parquet(out)
    val after = s.read.parquet(out).count()
    s.range(1).select(lit(before).as("n_before"), lit(after).as("n_after"))
  }

  /** Post-bulk-load "index build" (queries.py:41-47): no secondary
    * indexes on parquet — the equivalents are (a) PK uniqueness as a
    * checked invariant and (b) a sorted, partitioned rewrite so
    * created_at range queries prune via min/max stats (B-tree analog).
    */
  def ddlIndexConstraints(s: SparkSession, d: String): DataFrame = {
    val out = Files.createTempDirectory("graft_idx").resolve("orders").toString
    orders(s, d)
      .repartition(col("o_orderpriority"))
      .sortWithinPartitions(col("o_orderdate"))
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("o_orderkey")).as("n_keys"),
      (count(lit(1)) === countDistinct(col("o_orderkey"))).as("pk_ok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_xml" -> scanXml _,
    "scan_jsonl" -> scanJsonl _,
    "scan_compressed" -> scanCompressed _,
    "extract_comments" -> extractComments _,
    "source_http_replication" -> sourceHttpReplication _,
    "source_state_yaml" -> sourceStateYaml _,
    "ddl_create" -> ddlCreate _,
    "ddl_truncate" -> ddlTruncate _,
    "ddl_index_constraints" -> ddlIndexConstraints _
  )

  /** Known-answer oracles: the XML fixtures are deterministic
    * (FIXTURES.md §A), so every fixture-world query has an exact
    * VALUES-table oracle — no more rows-only checks. */
  val oracles: Map[String, String] = Map(
    "scan_xml" ->
      """SELECT * FROM (VALUES
        |  (CAST(10 AS BIGINT), CAST(7 AS BIGINT), TIMESTAMP '2015-11-15 22:00:01',
        |   CAST(40.6884971 AS DOUBLE), CAST(40.6911817 AS DOUBLE),
        |   CAST(-74.0474545 AS DOUBLE), CAST(-74.0433990 AS DOUBLE),
        |   TIMESTAMP '2015-11-15 22:05:00', false, 12, 'alice',
        |   '{"comment":"fix buildings","created_by":"JOSM/1.5 (8339)"}'),
        |  (11, 8, TIMESTAMP '2015-11-15 23:00:00', NULL, NULL, NULL, NULL,
        |   NULL, true, NULL, 'bob', '{}'),
        |  (12, 9, TIMESTAMP '2015-11-15 23:30:00',
        |   CAST(-95.0 AS DOUBLE), CAST(91.0 AS DOUBLE),
        |   CAST(-10.0 AS DOUBLE), CAST(10.0 AS DOUBLE),
        |   NULL, false, NULL, NULL, '{"created_by":"Potlatch 2"}')
        |) AS t(id, user_id, created_at, min_lat, max_lat, min_lon, max_lon,
        |       closed_at, open, num_changes, user_name, tags_json)""".stripMargin,
    "scan_jsonl" ->
      """SELECT * FROM (VALUES
        |  (CAST(10 AS BIGINT), CAST(7 AS BIGINT), 'alice',
        |   TIMESTAMP '2015-11-15 22:00:01', TIMESTAMP '2015-11-15 22:05:00',
        |   false, CAST(12 AS INTEGER),
        |   CAST(40.6884971 AS DOUBLE), CAST(40.6911817 AS DOUBLE),
        |   CAST(-74.0474545 AS DOUBLE), CAST(-74.043399 AS DOUBLE),
        |   '{"comment":"fix buildings","created_by":"JOSM/1.5 (8339)"}'),
        |  (11, 8, 'bob', TIMESTAMP '2015-11-15 23:00:00',
        |   CAST(NULL AS TIMESTAMP), true, CAST(NULL AS INTEGER),
        |   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), '{}'),
        |  (12, 9, 'carol', TIMESTAMP '2015-11-15 23:30:00',
        |   TIMESTAMP '2015-11-16 00:30:00', false, 3,
        |   CAST(-95.0 AS DOUBLE), CAST(91.0 AS DOUBLE),
        |   CAST(-181.5 AS DOUBLE), CAST(200.25 AS DOUBLE), '{"bot":"yes"}'))
        |AS t(id, uid, user, created_at, closed_at, open, num_changes,
        |     min_lat, max_lat, min_lon, max_lon, tags_json)""".stripMargin,
    "scan_compressed" ->
      """SELECT * FROM (VALUES
        |  (CAST(10 AS BIGINT), CAST(8 AS BIGINT), 'bob',
        |   TIMESTAMP '2015-11-16 00:00:00', 'looks good'),
        |  (10, 9, 'carol', TIMESTAMP '2015-11-16 01:00:00', 'thanks')
        |) AS t(comment_changeset_id, comment_user_id, comment_user_name,
        |       comment_date, comment_text)""".stripMargin,
    "extract_comments" ->
      """SELECT * FROM (VALUES
        |  (CAST(10 AS BIGINT), CAST(8 AS BIGINT), 'bob',
        |   TIMESTAMP '2015-11-16 00:00:00', 'looks good'),
        |  (10, 9, 'carol', TIMESTAMP '2015-11-16 01:00:00', 'thanks')
        |) AS t(comment_changeset_id, comment_user_id, comment_user_name,
        |       comment_date, comment_text)""".stripMargin,
    // diff seq s carries changeset 11 (num_changes=s) + new id 100+s
    "source_http_replication" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), '000/000/001.osm.gz', CAST(11 AS BIGINT), 1),
        |  (1, '000/000/001.osm.gz', 101, 1),
        |  (2, '000/000/002.osm.gz', 11, 2),
        |  (2, '000/000/002.osm.gz', 102, 1),
        |  (3, '000/000/003.osm.gz', 11, 3),
        |  (3, '000/000/003.osm.gz', 103, 1),
        |  (4, '000/000/004.osm.gz', 11, 4),
        |  (4, '000/000/004.osm.gz', 104, 1)
        |) AS t(seq, seq_path, id, num_changes)""".stripMargin,
    "source_state_yaml" ->
      """SELECT CAST(1612345 AS BIGINT) AS sequence,
        |  '2015-11-16 12:00:00.000000000 +00:00' AS last_run""".stripMargin,
    "ddl_create" ->
      "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag",
    "ddl_truncate" ->
      "SELECT count(*) AS n_before, CAST(0 AS BIGINT) AS n_after FROM events",
    "ddl_index_constraints" ->
      """SELECT count(*) AS n_rows, count(DISTINCT o_orderkey) AS n_keys,
        |  count(*) = count(DISTINCT o_orderkey) AS pk_ok FROM orders""".stripMargin
  )
}
