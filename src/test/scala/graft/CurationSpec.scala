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
}
