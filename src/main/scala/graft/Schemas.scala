package graft

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed API boundary (SURVEY.md §1.2): case classes + Encoders for
  * the reference's relations. DataFrames stay the universal internal
  * relation; these types are for library users who want compile-time
  * field checks at the edges.
  *
  * Schemas from the reference DDL `queries.py:6-33`; nullability per
  * `README.md:95` (everything but id/created_at nullable) and
  * `queries.py:22-26` (all comment columns NOT NULL).
  */
object Schemas {

  /** osm_changeset (queries.py:7-20). Coordinates are exact
    * DECIMAL(10,7) in the relation; surfaced here as BigDecimal. */
  case class Changeset(
      id: Long,
      user_id: Option[Long],
      created_at: java.sql.Timestamp,
      min_lat: Option[java.math.BigDecimal],
      max_lat: Option[java.math.BigDecimal],
      min_lon: Option[java.math.BigDecimal],
      max_lon: Option[java.math.BigDecimal],
      closed_at: Option[java.sql.Timestamp],
      open: Option[Boolean],
      num_changes: Option[Int],
      user_name: Option[String],
      tags: Map[String, String])

  /** osm_changeset_comment (queries.py:21-27). */
  case class Comment(
      comment_changeset_id: Long,
      comment_user_id: Long,
      comment_user_name: String,
      comment_date: java.sql.Timestamp,
      comment_text: String)

  implicit val changesetEncoder: Encoder[Changeset] = Encoders.product[Changeset]
  implicit val commentEncoder: Encoder[Comment] = Encoders.product[Comment]

  /** The declared StructTypes (for readers that need an explicit
    * schema, e.g. streaming sources). */
  val changesetSchema: StructType = changesetEncoder.schema
  val commentSchema: StructType = commentEncoder.schema

  /** Lift the XML-scan DataFrames into the typed API. */
  def changesets(df: DataFrame): Dataset[Changeset] = df.as[Changeset](changesetEncoder)
  def comments(df: DataFrame): Dataset[Comment] = df.as[Comment](commentEncoder)
}
