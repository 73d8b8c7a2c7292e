package graft

import org.apache.spark.sql.functions._

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

  test("multimodal: resize plan fits the box and preserves aspect ratio") {
    assert(Multimodal.FakeResizer.plan(480, 240, 64, 64) === ((63L, 31L)))
    assert(Multimodal.FakeResizer.plan(32, 32, 64, 64) === ((32L, 32L))) // never upscale
  }

  test("multimodal: frame sampling emits stride-spaced indices") {
    val docs = Seq((1L, "abcd")).toDF("doc_id", "text") // 4 bytes -> 12 frames
    val out = Multimodal.frameSample(Multimodal.withPayload(docs), 7)
    assert(rowSet(out) === Set(Seq(1L, 0L, 12L), Seq(1L, 7L, 12L)))
  }

  test("multimodal: block stats over codepoints, block boundary exact") {
    val docs = Seq((1L, "ab" + ("x" * 63))).toDF("doc_id", "text") // 65 cps -> 2 blocks
    val out = Multimodal.blockStats(docs, 64).collect().map(_.toSeq).toSet
    assert(out === Set(
      Seq(1L, 0L, 64L, 97L + 98L + 62L * 120L, 97L, 120L),
      Seq(1L, 1L, 1L, 120L, 120L, 120L)))
  }

  test("multimodal: scene cuts flag exactly the above-threshold mean jumps") {
    // blocks of 2 cps: "aa"(mean 97000), "zz"(122000), "aa"(97000),
    // "ab"(97500) -> deltas 25000, 25000, 500
    val docs = Seq((1L, "aazzaaab")).toDF("doc_id", "text")
    val out = Multimodal.sceneCuts(docs, 2, thresholdE3 = 1000)
      .collect().map(_.toSeq).toSet
    assert(out === Set(
      Seq(1L, 1L, 122000L, 97000L, 25000L, true),
      Seq(1L, 2L, 97000L, 122000L, 25000L, true),
      Seq(1L, 3L, 97500L, 97000L, 500L, false)))
    // single-block doc has no adjacent pair -> no rows
    assert(Multimodal.sceneCuts(Seq((2L, "ab")).toDF("doc_id", "text"), 2)
      .count() === 0)
  }

  test("multimodal: audio fingerprint packs energy-delta signs, drops the partial window") {
    // "aaaabbbb": windows (4·97=388, 4·98=392) — one rising delta, bit 0
    val docs = Seq((1L, "aaaabbbb")).toDF("doc_id", "text")
    val fp = Multimodal.audioFingerprint(Multimodal.withPayload(docs))
    assert(rowSet(fp) === Set(Seq(1L, 2L, 1L)))
    // a trailing partial window never contributes energy or count
    val partial = Seq((1L, "aaaabbbbcc")).toDF("doc_id", "text")
    assert(rowSet(Multimodal.audioFingerprint(Multimodal.withPayload(partial)))
      === Set(Seq(1L, 2L, 1L)))
    // falling then rising: "bbbbaaaacccc" -> energies 392, 388, 396 ->
    // bits (0: 388>392 no, 1: 396>388 yes) = 2
    val wave = Seq((1L, "bbbbaaaacccc")).toDF("doc_id", "text")
    assert(rowSet(Multimodal.audioFingerprint(Multimodal.withPayload(wave)))
      === Set(Seq(1L, 3L, 2L)))
    // constant-offset robustness (the Haitsma–Kalker point): shifting
    // every sample by +1 codepoint leaves every sign bit unchanged
    val shifted = Seq((1L, "ccccbbbbdddd")).toDF("doc_id", "text")
    assert(rowSet(Multimodal.audioFingerprint(Multimodal.withPayload(shifted)))
      === Set(Seq(1L, 3L, 2L)))
    // fewer samples than one window: zero windows, zero fingerprint
    assert(rowSet(Multimodal.audioFingerprint(
      Multimodal.withPayload(Seq((2L, "ab")).toDF("doc_id", "text"))))
      === Set(Seq(2L, 0L, 0L)))
    // null payload -> null fingerprint columns (decodeMeta convention,
    // CASEd identically in the SQL twin)
    assert(rowSet(Multimodal.audioFingerprint(Multimodal.withPayload(
      Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"))))
      === Set(Seq(9L, null, null)))
    // composition: fp drops into the banded Hamming near-dup machinery
    // (60 bits = 4 bands of 15) — the offset-shifted near-copy pairs
    // with the original at Hamming 0; the reversed-shape doc does not
    val corpus = Seq(
      (1L, "bbbbaaaacccc"), (2L, "ccccbbbbdddd"), (3L, "ccccbbbbaaaa"))
      .toDF("doc_id", "text")
    val sigs = Multimodal.audioFingerprint(Multimodal.withPayload(corpus))
      .select(col("doc_id"), col("fp").as("simhash"))
    val pairs = graft.operators.Dedup.simhashPairs(sigs, maxHamming = 0, bits = 60)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && !pairs.contains((1L, 3L)))
  }

  test("multimodal: a custom codec injects through the seam, operators unchanged") {
    // a toy "real" codec: fixed 16x16 dims, 3 frames, bytes as samples —
    // every operator must pick it up via the parameter alone
    object ToyCodec extends Multimodal.MediaCodec {
      def decode(p: Array[Byte]): (Long, String, Long, Long) =
        (p.length.toLong, "beef", 16L, 16L)
      def frameCount(p: Array[Byte]): Long = 3L
      def samples(p: Array[Byte]): Iterator[Long] = p.iterator.map(b => (b & 0xff).toLong)
    }
    val docs = Seq((1L, "abcd")).toDF("doc_id", "text")
    val wp = Multimodal.withPayload(docs)
    assert(rowSet(Multimodal.decodeMeta(wp, codec = ToyCodec))
      === Set(Seq(1L, 4L, "beef", 16L, 16L)))
    assert(rowSet(Multimodal.frameSample(wp, 2, codec = ToyCodec))
      === Set(Seq(1L, 0L, 3L), Seq(1L, 2L, 3L)))
    assert(rowSet(Multimodal.resizeMeta(wp, 8, 8, codec = ToyCodec))
      === Set(Seq(1L, 16L, 16L, 8L, 8L)))
    // stub-codec perceptual hash ≡ the text blockStats formulation
    // (codepoint samples), pinning the refactor onto the seam
    val viaCodec = rowSet(Multimodal.perceptualHash(docs, 2))
    val bs = Multimodal.blockStats(docs, 2)
    val tot = bs.groupBy(col("doc_id")).agg(
      sum(col("sum_cp")).as("tot_sum"), sum(col("n_cp")).as("tot_n"))
    val viaText = rowSet(bs.join(tot, Seq("doc_id"))
      .filter(col("block_no") < 32)
      .groupBy(col("doc_id"))
      .agg(sum(expr(
        "CASE WHEN sum_cp * tot_n > tot_sum * n_cp " +
          "THEN shiftleft(CAST(1 AS BIGINT), CAST(block_no AS INT)) " +
          "ELSE CAST(0 AS BIGINT) END")).as("simhash")))
    assert(viaCodec === viaText)
  }
}
