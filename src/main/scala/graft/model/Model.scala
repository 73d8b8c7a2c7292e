package graft.model

import java.sql.Timestamp

/** Typed core of the property-graph data model.
  *
  * Mirrors the reference's shapes (see /root/reference):
  *  - `RelationshipDoc` ≙ ES `user_relationship` document
  *    (reference elastic.go:13-23): one row per person-pair with
  *    directional interaction scores.
  *  - `Edge` ≙ `has_connection` weighted directed edge with facet
  *    `score` (reference dgraph.go:24-32) — normalized to a flat
  *    edge-list row, the canonical Spark graph representation.
  *  - `Person` ≙ `Person` node (reference dgraph.go:15-22) plus the
  *    bulk-path boolean `is_trove_user` (reference cmd/bulk/main.go:307-314).
  *  - `TeamMember` ≙ MySQL `team_member` row (reference mysql.go:61-68).
  *
  * Person ids are kept as STRING keys throughout: the reference's ids
  * span the full uint64 range (shard 2 upper bound 2^64−1, reference
  * cmd/bulk/main.go:248-249), which overflows LongType. Range routing,
  * when needed, casts to DecimalType(20,0) — never to long.
  */
final case class Stats(raw_score_in: Int, raw_score_out: Int)

final case class RelationshipDoc(
    last_update: Timestamp,
    from_person_id: String,
    to_person_id: String,
    stats: Stats)

final case class Edge(src: String, dst: String, score: Double)

final case class Person(person_id: String, is_trove_user: Boolean)

final case class TeamMember(team_id: String, person_id: String)
