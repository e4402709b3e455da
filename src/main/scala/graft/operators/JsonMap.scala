package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Dynamic property-bag operators — the hstore surface of the
  * reference (`tags hstore`, queries.py:19; operators `?` and `->`,
  * README.md:110-118) re-expressed over Spark's native MapType.
  *
  * The test corpus carries the bag as a JSON string (`events.props`),
  * so the scan step is `from_json` → MAP<STRING,STRING>; on OSM data
  * the same map comes out of the XML scan via `map_from_entries`
  * (sources/OsmXml.scala). All downstream operators are identical —
  * that indirection is the point: the property-bag algebra is
  * storage-agnostic.
  *
  * Scale note: these are narrow per-row expressions (no shuffle); the
  * Postgres GIN index has no analog, but on parquet the predicates
  * stay in whole-stage codegen and column pruning keeps the scan to
  * the two referenced columns.
  */
object JsonMap {

  private val mapSchema = MapType(StringType, StringType)

  /** props JSON → MAP<STRING,STRING>, the `tags` column. */
  def tags(df: DataFrame): DataFrame =
    df.withColumn("tags", from_json(col("props"), mapSchema))

  /** Fold the property bag out into (id, key, value) rows — the
    * inverse of the reference's `<tag k v>` fold
    * (`changesetmd.py:90-92`). */
  def extractTagsMap(s: SparkSession, d: String): DataFrame =
    tags(events(s, d))
      .select(col("event_id"), explode(col("tags")).as(Seq("tag_k", "tag_v")))

  /** hstore containment `tags ? 'k'` (README.md:112) + count. */
  def mapContains(s: SparkSession, d: String): DataFrame =
    tags(events(s, d))
      .filter(map_contains_key(col("tags"), "k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_with_k"))

  /** hstore lookup + prefix LIKE: `tags -> 'created_by' LIKE 'JOSM%'`
    * (README.md:118). Missing key → NULL → LIKE is null-false,
    * matching Postgres. */
  def mapLookupLike(s: SparkSession, d: String): DataFrame =
    tags(events(s, d))
      .filter(element_at(col("tags"), "k").like("1%"))
      .select(col("event_id"), element_at(col("tags"), "k").as("k_val"))

  /** Map construction/inspection algebra: keys, values, size,
    * re-keyed map roundtrip. Arrays stringified for comparison. */
  def fnMap(s: SparkSession, d: String): DataFrame =
    tags(events(s, d)).select(
      col("event_id"),
      array_join(map_keys(col("tags")), ",").as("keys_csv"),
      array_join(map_values(col("tags")), ",").as("vals_csv"),
      size(col("tags")).as("n_tags"),
      element_at(map_from_entries(arrays_zip(
        map_keys(col("tags")), map_values(col("tags"))).cast(
        ArrayType(StructType(Seq(StructField("k", StringType), StructField("v", StringType)))))),
        "k").as("roundtrip_v"))

  /** Raw JSON access without the map detour — `get_json_object`,
    * numeric extraction. */
  def fnJson(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast(LongType).as("k_num"),
      get_json_object(col("props"), "$.missing").as("absent"))

  /** Array function coverage over tokenized text (documents). */
  def fnArray(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    documents(s, d).select(
      col("doc_id"),
      size(words).as("n_words"),
      element_at(words, 1).as("first_word"),
      element_at(words, -1).as("last_word"),
      array_contains(words, "the").as("has_the"),
      array_join(slice(words, 1, 3), " ").as("first3"),
      size(array_distinct(words)).as("n_uniq_words"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "extract_tags_map" -> extractTagsMap _,
    "map_contains" -> mapContains _,
    "map_lookup_like" -> mapLookupLike _,
    "fn_map" -> fnMap _,
    "fn_json" -> fnJson _,
    "fn_array" -> fnArray _
  )

  val oracles: Map[String, String] = Map(
    "extract_tags_map" ->
      """SELECT event_id, k.k AS tag_k, json_extract_string(props, '$.' || k.k) AS tag_v
        |FROM events, unnest(json_keys(props)) AS k(k)""".stripMargin,
    "map_contains" ->
      """SELECT event_type, count(*) AS n_with_k FROM events
        |WHERE json_extract(props, '$.k') IS NOT NULL
        |GROUP BY event_type""".stripMargin,
    "map_lookup_like" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_val
        |FROM events WHERE json_extract_string(props, '$.k') LIKE '1%'""".stripMargin,
    "fn_map" ->
      """SELECT event_id,
        |  array_to_string(json_keys(props), ',') AS keys_csv,
        |  array_to_string([json_extract_string(props, '$.' || k) FOR k IN json_keys(props)], ',') AS vals_csv,
        |  len(json_keys(props)) AS n_tags,
        |  json_extract_string(props, '$.k') AS roundtrip_v
        |FROM events""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        |  json_extract_string(props, '$.missing') AS absent
        |FROM events""".stripMargin,
    "fn_array" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_words,
        |  string_split(text, ' ')[1] AS first_word,
        |  string_split(text, ' ')[-1] AS last_word,
        |  list_contains(string_split(text, ' '), 'the') AS has_the,
        |  array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
        |  len(list_distinct(string_split(text, ' '))) AS n_uniq_words
        |FROM documents""".stripMargin
  )
}
