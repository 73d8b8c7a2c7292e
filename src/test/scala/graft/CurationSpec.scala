package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.TextOps
import graft.pipelines.Curation

/** End-to-end curation DAG: each stage's drop reason is pinned with a
  * purpose-built document.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // quality-passing base text: >=5 tokens, >=1% stopwords
  private val base = "the cat sat on the mat today"

  private val docs = Seq(
    (1L, base),                                   // survives
    (2L, base),                                   // exact dup of 1 -> dropped
    (3L, "mat the today on sat cat the"),         // permutation of 1's tokens:
                                                  // identical SimHash (bag-of-
                                                  // tokens) -> clustered w/ 1,
                                                  // dropped as non-minimum
    (4L, "x y z"),                                // < 5 tokens -> quality drop
    (5L, "a completely different document with the usual stopwords in it and more")
  ).toDF("doc_id", "text")

  test("curate: survivors, drop reasons, and split assignment") {
    val out = Curation.curate(docs, 800, 100, 3, Hashing.Portable)
      .select("doc_id", "bucket", "split")
    val survivors = out.collect().map(r => r.getLong(0)).toSet
    assert(survivors === Set(1L, 5L))

    // split columns must equal hashSplit applied to the surviving docs
    val expected = TextOps.hashSplit(
      docs.filter(col("doc_id").isin(1L, 5L)), 800, 100, hash = Hashing.Portable)
    assert(rowSet(out) === rowSet(expected))
  }

  test("curate with repetition + decontamination gates drops by each reason") {
    val gated = Seq(
      (1L, base),                                            // survives
      (5L, "a completely different document with the usual stopwords in it and more"),
      // quality-passing but one bigram dominates -> repetition drop
      (6L, "the spam the spam the spam the spam the spam the spam"),
      // quality-passing but shares >= 2 trigrams with the probe -> decontaminated
      (7L, "the benchmark question appears here verbatim in the corpus today")
    ).toDF("doc_id", "text")
    val probes = Seq((100L, "the benchmark question appears here too")).toDF("doc_id", "text")
    val out = Curation.curate(gated, 800, 100, 3, Hashing.Portable,
      maxTopBigramE3 = 400, probes = Some(probes), minSharedShingles = 2)
    assert(out.collect().map(_.getLong(0)).toSet === Set(1L, 5L))
    // gates off -> base behavior keeps 6 and 7 too
    val off = Curation.curate(gated, 800, 100, 3, Hashing.Portable)
    assert(off.collect().map(_.getLong(0)).toSet === Set(1L, 5L, 6L, 7L))
  }

  test("curate on empty input is empty, not an error") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.curate(empty, 800, 100, 3, Hashing.Portable).count() === 0L)
  }

  test("curate is idempotent: re-curating the survivors is a no-op") {
    val once = Curation.curate(docs, 800, 100, 3, Hashing.Portable)
    val kept = docs.join(once.select("doc_id"), Seq("doc_id"), "left_semi")
    val twice = Curation.curate(kept, 800, 100, 3, Hashing.Portable)
    assert(rowSet(once) === rowSet(twice))
  }

  test("leakageSafeSplit: near-copies share a split; buckets hash the cluster id") {
    // doc 2 is a near-copy of doc 1 (one word changed -> SimHash
    // Hamming ≤ 3); a per-document content-hash split CAN separate
    // them, the cluster split never does
    val d1 = "the quick brown fox jumps over the lazy dog in the morning sun today"
    val d2 = d1.replace("today", "tonight")
    val docs = Seq(
      (1L, d1), (2L, d2),
      (3L, "a completely different document about spark plans and shuffles entirely"),
      (4L, "yet another unrelated piece of text with its own words and nothing shared")
    ).toDF("doc_id", "text")
    val out = Curation.leakageSafeSplit(docs, 800, 100, 3, Hashing.Portable)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // same cluster -> same bucket -> same split, and the cluster is 1's id
    assert(out(1L)._1 === 1L && out(2L)._1 === 1L, s"near-copies split apart: $out")
    assert(out(1L) === out(2L).copy(_1 = out(1L)._1))
    // singletons hash their own id
    assert(out(3L)._1 === 3L && out(4L)._1 === 4L)
    // bucket is the portable hash of the component id string, mod 1000
    def phStr(s: String): Long =
      s.foldLeft(7L)((h, c) => (h * 31 + c.toLong) % graft.functions.Hashing.P) % 1000L
    assert(out(1L)._2 === phStr("1") && out(3L)._2 === phStr("3"))
    // every doc is assigned exactly once
    assert(out.size === 4)
  }

  test("curate quota stage caps each source's surviving contribution") {
    // two distinct quality-passing docs per source; quota 1 keeps
    // exactly one per source, chosen by content-hash order
    val sourced = Seq(
      (1L, "sA", base),
      (2L, "sA", "a completely different document with the usual stopwords in it and more"),
      (3L, "sB", "the quick brown fox jumps over the lazy dog again it seems"),
      (4L, "sB", "yet another ordinary sentence with the common stopwords in it today")
    ).toDF("doc_id", "source", "text")
    val out = Curation.curate(sourced, 800, 100, 3, Hashing.Portable,
      quota = Some(("source", 1)))
    val perSource = out.join(sourced, Seq("doc_id"))
      .groupBy("source").count().collect()
    assert(perSource.length === 2 && perSource.forall(_.getLong(1) === 1L))
    // quota off keeps all four
    assert(Curation.curate(sourced, 800, 100, 3, Hashing.Portable).count() === 4L)
  }

  test("webCurate: URL gate, strip, line dedup, and domain quota compose") {
    val web = Seq(
      // two docs on one domain sharing a boilerplate line: the second
      // keeps only its body after line dedup
      (1L, "https://a.example.com/p1",
        "<p>shared cookie banner text here</p><p>first unique body line</p>"),
      (2L, "https://b.example.com/p2?utm_source=x",
        "<p>shared cookie banner text here</p><p>second unique body line</p>"),
      // no URL -> dropped at the gate even with fine text
      (3L, "not a url", "<p>perfectly good body text here</p>"),
      // all-boilerplate page: nothing survives the strip -> dropped
      (4L, "https://c.example.com/nav", "<div>Home | About | Contact</div>"),
      // page whose EVERY line deduped away -> dropped after stage 3
      (5L, "https://d.example.com/copy",
        "<p>shared cookie banner text here</p>"),
      // GATE-FIRST pinned: doc 0 has no URL and carries doc 6's ONLY
      // line with a smaller id — were line dedup to run before the
      // gate, doc 0 would claim the keep-first slot, then vanish at
      // the gate, and doc 6 would lose its only line and drop too
      (0L, "no url here", "<p>only shared line here</p>"),
      (6L, "https://e.example.com/six", "<p>only shared line here</p>")
    ).toDF("doc_id", "url", "text")
    val out = Curation.webCurate(web, domainK = 10, hash = Hashing.Portable)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet === Set(1L, 2L, 6L), s"got $out")
    assert(out(1L) === "example.com" && out(2L) === "example.com")
    // the quota binds per REGISTERED domain: k=1 admits only one of
    // the two example.com docs
    assert(Curation.webCurate(web, domainK = 1, hash = Hashing.Portable)
      .count() === 1L)
  }

  test("reliable-checkpoint mode is result-identical for curate and leakageSafeSplit") {
    val ckpt = Some(TestSpark.ckptDir)
    assert(rowSet(Curation.curate(docs, 800, 100, 3, Hashing.Portable,
        checkpointDir = ckpt))
      === rowSet(Curation.curate(docs, 800, 100, 3, Hashing.Portable)))
    assert(rowSet(Curation.leakageSafeSplit(docs, 800, 100, 3, Hashing.Portable,
        checkpointDir = ckpt))
      === rowSet(Curation.leakageSafeSplit(docs, 800, 100, 3, Hashing.Portable)))
  }
}
