package graft

import graft.model.Edge
import graft.operators.Multimodal
import graft.sinks.Rdf

/** Golden byte-format specs: the RDF shapes are pinned to the reference
  * (cmd/bulk/main.go:271-328) — blank nodes, typed boolean literal,
  * integer-rendered facet.
  */
class RdfSpec extends SparkSpec {
  import spark.implicits._

  test("edge triple: integer facet rendering of a double score") {
    val out = Rdf.edgeTriples(Seq(Edge("A", "B", 5.0)).toDF())
    assert(strings(out, "triple") === Set("_:A <has_connection> _:B (score=5) ."))
  }

  test("person triples: id + typed boolean, two lines per person") {
    val persons = Seq(("P1", true), ("P2", false)).toDF("person_id", "is_trove_user")
    assert(strings(Rdf.personTriples(persons), "triple") === Set(
      "_:P1 <person_id> \"P1\" .",
      "_:P1 <is_trove_user> \"true\"^^<xs:boolean> .",
      "_:P2 <person_id> \"P2\" .",
      "_:P2 <is_trove_user> \"false\"^^<xs:boolean> ."))
  }

  test("team + membership triples") {
    val teams = Seq("T1").toDF("team_id")
    val tm = Seq(("T1", "P1")).toDF("team_id", "person_id")
    assert(strings(Rdf.teamTriples(teams), "triple") === Set("_:T1 <team_id> \"T1\" ."))
    assert(strings(Rdf.teamMemberTriples(tm), "triple")
      === Set("_:T1 <has_member> _:P1 ."))
  }

  test("multimodal: mapPartitions decode agrees with the SQL metadata twin") {
    val docs = Seq((1L, "hello world"), (2L, "x")).toDF("doc_id", "text")
    val decoded = Multimodal.decodeMeta(Multimodal.withPayload(docs))
    val sqlTwin = Multimodal.metaSql(docs)
    assert(rowSet(decoded) === rowSet(sqlTwin))
  }
}
