package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** RDF N-Quads sink (SURVEY §2.1 S6 / §2.2 P5) — the bulk path's triple
  * file for Dgraph's offline bulk loader.
  *
  * BYTE FORMAT pinned to the reference (cmd/bulk/main.go:271-328):
  *  - blank-node subjects/objects: `_:<id>`
  *  - boolean literal is typed: `"true"^^<xs:boolean>`
  *  - edge facet inline with *integer* rendering: `(score=5)` even
  *    though scores are stored as doubles (reference renders with %d at
  *    cmd/bulk/main.go:325-326).
  *
  * EDGE DIRECTION / SCORE PAIRING deliberately follows the shared
  * transform `dgraph.go TransformElasticToDgraph` (from→to carries
  * `raw_score_in`, to→from carries `raw_score_out`) — the convention
  * the live `etl` binary writes. The reference is internally
  * inconsistent here: `cmd/bulk/main.go createRDFRelationships` pairs
  * the directions the OTHER way (to→from with RawScoreIn), so its bulk
  * and live outputs disagree with each other. One engine cannot match
  * both; the "pinned to cmd/bulk/main.go" claim above covers byte
  * format only, not the direction/score pairing.
  *
  * All formatters are codegen'd `format_string` projections — string
  * construction happens inside whole-stage codegen, no UDFs. The sink
  * writes a *directory* of part files; Dgraph's bulk loader accepts a
  * directory, so there is no single-file coalesce bottleneck at scale.
  */
object Rdf {

  /** `_:T <team_id> "T" .` (reference cmd/bulk/main.go:271-273) */
  def teamTriples(teams: DataFrame): DataFrame =
    teams.select(
      format_string("_:%s <team_id> \"%s\" .", col("team_id"), col("team_id"))
        .as("triple"))

  /** `_:T <has_member> _:P .` (reference cmd/bulk/main.go:275-277) */
  def teamMemberTriples(teamMembers: DataFrame): DataFrame =
    teamMembers.select(
      format_string("_:%s <has_member> _:%s .", col("team_id"), col("person_id"))
        .as("triple"))

  /** Person id + typed boolean trove flag
    * (reference cmd/bulk/main.go:307-314): two triples per person.
    */
  def personTriples(persons: DataFrame): DataFrame =
    persons.select(
      explode(array(
        format_string("_:%s <person_id> \"%s\" .", col("person_id"), col("person_id")),
        format_string(
          "_:%s <is_trove_user> \"%s\"^^<xs:boolean> .",
          col("person_id"),
          when(col("is_trove_user"), "true").otherwise("false"))
      )).as("triple"))

  /** `_:A <has_connection> _:B (score=5) .` — facet with integer
    * rendering (reference cmd/bulk/main.go:324-327).
    */
  def edgeTriples(edges: DataFrame): DataFrame =
    edges.select(
      format_string(
        "_:%s <has_connection> _:%s (score=%d) .",
        col("src"), col("dst"), col("score").cast("long"))
        .as("triple"))

  /** Union all triple streams and write as line-oriented text.
    * Part-file parallelism is preserved — the loader consumes the
    * directory.
    */
  def writeTriples(path: String, tripleSets: DataFrame*): Unit = {
    val all = tripleSets.reduce(_ union _)
    all.write.mode("overwrite").text(path)
  }

  def asStrings(triples: DataFrame): Dataset[String] = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples.select(col("triple")).as[String]
  }
}
