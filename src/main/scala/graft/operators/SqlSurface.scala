package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.Files
import graft.Tables._
import graft.sources.OsmXml

/** EP3 — the SQL entry point, demonstrated on the reference's own
  * example queries (`README.md:106-124`).
  *
  * The reference's user interface is psql: users type SQL against
  * `osm_changeset` / `osm_changeset_comment` with the hstore and
  * PostGIS extensions installed (`queries.py:6,50-51`). This engine's
  * equivalent is `spark.sql` against registered views with
  * [[graft.functions.GraftExtensions]] installed. Every query below is
  * SQL TEXT run through `spark.sql` — none of them touch the
  * DataFrame DSL — so the gate proves the full parse→analyze→optimize
  * path a SQL user exercises, including:
  *
  *   - Postgres `tags ? 'k'`        → `map_contains_key(tags, 'k')`
  *   - Postgres `tags -> 'k'`       → `try_element_at(tags, 'k')`
  *     (`->` is NULL on a missing key; under Spark's ANSI mode the
  *     faithful spelling is the `try_` form — plain `element_at`
  *     raises MAP_KEY_DOES_NOT_EXIST)
  *   - `ST_CoveredBy(geom, env)`    → boundary-inclusive interval
  *     predicates over the envelope struct's corners
  *   - `ST_Area(ST_Transform(...))` → the injected `bbox_area`
  *     Catalyst expression (usable from SQL because GraftExtensions
  *     registers it in the session function registry)
  *
  * Two tiers of evidence:
  *   - `sql_readme_{1..4}`: the README queries VERBATIM (same keys,
  *     same Liberty Island envelope) over the deterministic XML bulk
  *     fixture, with exact VALUES oracles.
  *   - `sql_*` scale entries: the same SQL shapes over the parquet
  *     test tables, sharing the existing DataFrame entries' oracles —
  *     proving SQL text and DataFrame DSL lower to the same results
  *     (and, in PlanAudit, the same physical plans — including the
  *     GridBboxJoinRule firing on a SQL-typed containment join).
  */
object SqlSurface {

  /** Register the OSM-world views (changesets + comments from the XML
    * bulk fixture) and install the engine's SQL functions + rules —
    * the `CREATE EXTENSION` + table-create step of the reference's
    * setup (`changesetmd.py:35-50`), as one call. */
  /** The XML fixture is identical for every query invocation — write
    * it ONCE per JVM (r14 ADVICE: per-call temp dirs accumulated and
    * re-paid identical I/O across the 9 sql_* gate entries × every
    * bench/verify run); only the view REGISTRATION is per-session. */
  private lazy val fixturePath: java.nio.file.Path = {
    val p = Files.createTempDirectory("graft_sql_xml").resolve("dump.osm.xml")
    OsmXml.writeFixture(p, OsmXml.bulkFixture)
    p
  }

  def fixtureViews(s: SparkSession): Unit = {
    graft.functions.GraftExtensions.register(s)
    val raw = OsmXml.scan(s, fixturePath.toString)
    OsmXml.changesets(raw).createOrReplaceTempView("osm_changeset")
    OsmXml.comments(raw).createOrReplaceTempView("osm_changeset_comment")
  }

  /** Register the data-scale views: the events-borne property-bag
    * table and the synthetic bbox relations (same shapes the
    * DataFrame entries query), plus the SQL function registry. */
  def scaleViews(s: SparkSession, d: String): Unit = {
    graft.functions.GraftExtensions.register(s)
    JsonMap.tags(events(s, d)).createOrReplaceTempView("changesets_ev")
    Spatial.ordersBbox(s, d).createOrReplaceTempView("changeset_bbox")
    Spatial.customerBbox(s, d).createOrReplaceTempView("changeset_bbox_b")
  }

  // ---- the README's own queries, as SQL text (README.md:106-124) ----

  /** "Count how many changesets have a comment tag" —
    * `WHERE tags ? 'comment'` (README.md:110-112). */
  def sqlReadme1(s: SparkSession, d: String): DataFrame = {
    fixtureViews(s)
    s.sql(
      """SELECT count(*) AS n
        |FROM osm_changeset
        |WHERE map_contains_key(tags, 'comment')""".stripMargin)
  }

  /** "Find all changesets that were created by JOSM" —
    * `WHERE tags -> 'created_by' LIKE 'JOSM%'` (README.md:114-118). */
  def sqlReadme2(s: SparkSession, d: String): DataFrame = {
    fixtureViews(s)
    s.sql(
      """SELECT count(*) AS n
        |FROM osm_changeset
        |WHERE try_element_at(tags, 'created_by') LIKE 'JOSM%'""".stripMargin)
  }

  /** The discussion-comment join — the query the comment table exists
    * for (`queries.py:21-27`; README.md:96-103 documents the FK). */
  def sqlReadme3(s: SparkSession, d: String): DataFrame = {
    fixtureViews(s)
    s.sql(
      """SELECT c.id, c.user_name,
        |       m.comment_user_id, m.comment_user_name, m.comment_text
        |FROM osm_changeset c
        |JOIN osm_changeset_comment m ON m.comment_changeset_id = c.id""".stripMargin)
  }

  /** "Find all changesets that were created in Liberty Island" —
    * `ST_CoveredBy(c.geom, ST_MakeEnvelope(...))` (README.md:120-124),
    * same envelope constants, boundary-inclusive. */
  def sqlReadme4(s: SparkSession, d: String): DataFrame = {
    fixtureViews(s)
    s.sql(
      """SELECT count(id) AS n
        |FROM osm_changeset c,
        |     (SELECT -74.0474545D AS lon_lo, 40.6884971D AS lat_lo,
        |             -74.0433990D AS lon_hi, 40.6911817D AS lat_hi) s
        |WHERE c.min_lon >= s.lon_lo AND c.max_lon <= s.lon_hi
        |  AND c.min_lat >= s.lat_lo AND c.max_lat <= s.lat_hi""".stripMargin)
  }

  // ---- the same SQL shapes at data scale (shared oracles) -----------

  /** `tags ? 'k'` count at data scale (shares map_contains' oracle). */
  def sqlMapContains(s: SparkSession, d: String): DataFrame = {
    scaleViews(s, d)
    s.sql(
      """SELECT event_type, count(*) AS n_with_k
        |FROM changesets_ev
        |WHERE map_contains_key(tags, 'k')
        |GROUP BY event_type""".stripMargin)
  }

  /** `tags -> 'k' LIKE '1%'` at data scale (shares map_lookup_like's
    * oracle). */
  def sqlLookupLike(s: SparkSession, d: String): DataFrame = {
    scaleViews(s, d)
    s.sql(
      """SELECT event_id, try_element_at(tags, 'k') AS k_val
        |FROM changesets_ev
        |WHERE try_element_at(tags, 'k') LIKE '1%'""".stripMargin)
  }

  /** The literal-envelope containment join as SQL text — an inline
    * VALUES envelope table against the bbox view (shares
    * join_range_bbox's oracle; plans to the same
    * BroadcastNestedLoopJoin, plan-audited). */
  def sqlEnvelopeJoin(s: SparkSession, d: String): DataFrame = {
    scaleViews(s, d)
    s.sql(
      """SELECT e.env_id, count(*) AS n_boxes,
        |       min(b.o_orderkey) AS min_key, max(b.o_orderkey) AS max_key
        |FROM changeset_bbox b
        |JOIN (VALUES (1, -20.0D,   30.0D, -10.0D, 40.0D),
        |             (2, 100.0D,  150.0D,   0.0D, 50.0D),
        |             (3, -170.0D, -110.0D, -60.0D, 10.0D),
        |             (4, 40.0D,    90.0D,  30.0D, 85.0D))
        |     AS e(env_id, lon_lo, lon_hi, lat_lo, lat_hi)
        |  ON b.min_lon >= e.lon_lo AND b.max_lon <= e.lon_hi
        | AND b.min_lat >= e.lat_lo AND b.max_lat <= e.lat_hi
        |GROUP BY e.env_id""".stripMargin)
  }

  /** The README's equal-area size filter (`ST_Area(ST_Transform(geom,
    * 3410)) < ...`, README.md:77) through the INJECTED `bbox_area`
    * expression, called from SQL text (shares filter_area's oracle). */
  def sqlAreaFilter(s: SparkSession, d: String): DataFrame = {
    scaleViews(s, d)
    s.sql(
      """SELECT o_orderkey,
        |  CAST(floor(bbox_area(min_lon, min_lat, max_lon, max_lat) / 1e6) AS BIGINT) AS area_km2
        |FROM changeset_bbox
        |WHERE bbox_area(min_lon, min_lat, max_lon, max_lat) < 2.0e10""".stripMargin)
  }

  /** The naive box-overlap theta join typed as SQL — the form a psql
    * user would write — planned by the injected GridBboxJoinRule into
    * the grid-cell equi-join (shares join_bbox_auto's oracle; the
    * rewrite on the SQL-typed plan is plan-audited via `graft_cx`). */
  private val bboxAutoSql =
    """SELECT cb.c_custkey, count(*) AS n_overlaps,
      |       min(b.o_orderkey) AS min_key, max(b.o_orderkey) AS max_key
      |FROM changeset_bbox b
      |JOIN changeset_bbox_b cb
      |  ON b.min_lon <= cb.c_max_lon AND b.max_lon >= cb.c_min_lon
      | AND b.min_lat <= cb.c_max_lat AND b.max_lat >= cb.c_min_lat
      |GROUP BY cb.c_custkey""".stripMargin

  /** Plan-construction variant (PlanAudit reads this one's plan). */
  def sqlBboxAutoPlan(s: SparkSession, d: String): DataFrame = {
    scaleViews(s, d)
    graft.plans.GridBboxJoinRule.install(s)
    s.sql(bboxAutoSql)
  }

  /** Gate variant: force the rewrite on the tiny tiers (same
    * SkipBytes pinning as Spatial.joinBboxAuto) and materialize under
    * the pinned conf. */
  def sqlBboxAuto(s: SparkSession, d: String): DataFrame = {
    scaleViews(s, d)
    graft.plans.GridBboxJoinRule.install(s)
    val key = graft.plans.GridBboxJoinRule.SkipBytesKey
    val prev = s.conf.getOption(key)
    s.conf.set(key, "0")
    try s.sql(bboxAutoSql).localCheckpoint(true)
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_readme_1" -> sqlReadme1 _,
    "sql_readme_2" -> sqlReadme2 _,
    "sql_readme_3" -> sqlReadme3 _,
    "sql_readme_4" -> sqlReadme4 _,
    "sql_map_contains" -> sqlMapContains _,
    "sql_lookup_like" -> sqlLookupLike _,
    "sql_envelope_join" -> sqlEnvelopeJoin _,
    "sql_area_filter" -> sqlAreaFilter _,
    "sql_bbox_auto" -> sqlBboxAuto _
  )

  /** Shared DuckDB rendering of the bulk fixture's changesets relation
    * (same VALUES table as Ingest's scan_xml oracle — FIXTURES.md §A). */
  private val fixtureSql =
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
      |       closed_at, open, num_changes, user_name, tags_json)""".stripMargin

  val oracles: Map[String, String] = Map(
    "sql_readme_1" ->
      s"""WITH c AS ($fixtureSql)
        |SELECT count(*) AS n FROM c
        |WHERE json_extract(tags_json, '$$.comment') IS NOT NULL""".stripMargin,
    "sql_readme_2" ->
      s"""WITH c AS ($fixtureSql)
        |SELECT count(*) AS n FROM c
        |WHERE json_extract_string(tags_json, '$$.created_by') LIKE 'JOSM%'""".stripMargin,
    "sql_readme_3" ->
      s"""WITH c AS ($fixtureSql),
        |m AS (SELECT * FROM (VALUES
        |  (CAST(10 AS BIGINT), CAST(8 AS BIGINT), 'bob', 'looks good'),
        |  (10, 9, 'carol', 'thanks')
        |) AS t(comment_changeset_id, comment_user_id, comment_user_name, comment_text))
        |SELECT c.id, c.user_name,
        |       m.comment_user_id, m.comment_user_name, m.comment_text
        |FROM c JOIN m ON m.comment_changeset_id = c.id""".stripMargin,
    "sql_readme_4" ->
      s"""WITH c AS ($fixtureSql)
        |SELECT count(id) AS n FROM c
        |WHERE min_lon >= -74.0474545 AND max_lon <= -74.0433990
        |  AND min_lat >= 40.6884971 AND max_lat <= 40.6911817""".stripMargin,
    // the scale-tier SQL entries share the DataFrame entries' oracles
    // VERBATIM — the point: SQL text and DSL answer the same question
    "sql_map_contains" -> JsonMap.oracles("map_contains"),
    "sql_lookup_like" -> JsonMap.oracles("map_lookup_like"),
    "sql_envelope_join" -> Spatial.oracles("join_range_bbox"),
    "sql_area_filter" -> Spatial.oracles("filter_area"),
    "sql_bbox_auto" -> Spatial.oracles("join_bbox_auto")
  )
}
