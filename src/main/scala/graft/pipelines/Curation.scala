package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.{Dedup, TextOps}

/** The canonical LLM training-data curation DAG, composed end-to-end
  * from the operator library (SURVEY §7.4):
  *
  *   quality gate → exact dedup → near-dup clustering → split assign
  *
  * Every stage is a `DataFrame → DataFrame` set operation — no driver
  * state, so the pipeline scales by partitioning alone:
  *
  *  1. quality gate: length/stopword heuristics ([[TextOps.qualityScore]]),
  *     a narrow projection + filter (no shuffle);
  *  2. exact dedup: one hash aggregate on text, keep the minimum id per
  *     identical body ([[Dedup.exactDedup]]);
  *  3. near-dup clustering: SimHash signatures → banded candidate pairs →
  *     Hamming verify → connected components; each cluster keeps its
  *     minimum id ([[Dedup.simhashPairs]], [[Dedup.connectedComponents]]);
  *  4. deterministic split: content-hash permille buckets
  *     ([[TextOps.hashSplit]]) — rerun-stable, engine-portable, layout-
  *     independent (vs `rand()` sampling).
  *
  * Output: one row per surviving document `(doc_id, bucket, split)`.
  */
object Curation {

  /** Default SimHash occupancy cap for the near-dup stage. Uncapped
    * band joins are quadratic in hot buckets (measured 28× wall at 10×
    * input on the sf1 smoke vs 1.5× capped), so the scale-safe capped
    * form is the default; pass `maxBucketSize = None` to opt out on
    * corpora known to be hot-bucket-free.
    *
    * BEHAVIOR CHANGE (since the r12 defaults flip, also in README):
    * callers who relied on the earlier uncapped default get lower
    * in-bucket near-dup recall when the cap is active — pairs whose
    * members the sub-split separates are dropped (identical-signature
    * docs always stay connected via the star floor). The change is
    * not silent at runtime: [[Dedup.occupancyProbe]] logs a warning
    * whenever the cap actually sub-splits a hot bucket.
    */
  val DefaultMaxBucketSize: Option[Int] = Some(Dedup.DefaultOccupancyCap)

  /** The web-corpus FRONT of the curation DAG (RefinedWeb §3's
    * URL-filter → extract → line-dedup → balance; CCNet's paragraph
    * dedup) composed from the r15 front-door operators — the stages
    * [[curate]] assumes already ran by the time it receives a clean
    * `(doc_id, source, text)` corpus:
    *
    *  1. URL gate: [[TextOps.urlParts]] over `urlCol`; rows without an
    *     absolute URL drop, and the REGISTERED DOMAIN becomes the
    *     balancing key (not an assumed-clean `source` column);
    *  2. extraction: [[TextOps.htmlStrip]] — markup off, jusText-lite
    *     boilerplate line filter; documents with no surviving line
    *     drop;
    *  3. line dedup: [[Dedup.lineDedup]] keep-first across the corpus;
    *     documents whose every line deduped away drop;
    *  4. domain quota: [[TextOps.domainQuota]] keyed by registered
    *     domain — at most `domainK` docs per domain, deterministic
    *     content-hash ranking.
    *
    * Output: `(doc_id, reg_domain, rn)` — admitted documents with
    * their quota rank; feed the survivors into [[curate]] for the
    * quality/dedup/split tail.
    *
    * Scale shape: the union of each stage's own contract — two narrow
    * regex/HOF projections, one 24-byte line-hash window + one
    * doc_id-keyed reassembly join, one reg_domain window with the
    * partial WindowGroupLimit. No stage adds a new exchange class.
    */
  def webCurate(
      docs: DataFrame,
      domainK: Int = 25,
      urlCol: String = "url",
      textCol: String = "text",
      minLineChars: Int = 5,
      hash: Hashing.HashTier = Hashing.Fast): DataFrame = {
    val parts = TextOps.urlParts(docs.select(col("doc_id"), col(urlCol)), urlCol)
      .filter(length(col("scheme")) > 0)
      .select(col("doc_id"), col("reg_domain"))
    // the gate runs FIRST (pinned): gated-out docs must not consume
    // keep-first slots downstream — a no-URL doc sharing a line with a
    // gated doc would otherwise claim the line's survivor slot and
    // then vanish at the join, deleting the content from EVERY output
    // document; gating first also spares the two expensive stages the
    // rejected rows
    val gated = docs.select(col("doc_id"), col(textCol).as("text"))
      .join(parts.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val stripped = TextOps.htmlStrip(gated)
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), col("clean_text").as("text"))
    val deduped = Dedup.lineDedup(stripped, minLineChars, hash = hash)
      .filter(length(col("retained_text")) > 0)
      .select(col("doc_id"), col("retained_text").as("text"))
    TextOps.domainQuota(
      deduped.join(parts, Seq("doc_id")), "reg_domain", domainK, hash = hash)
  }

  /** Optional extra gates (both off by default, so the base chain is
    * unchanged):
    *  - `maxTopBigramE3 < 1000` adds a repetition gate — docs whose
    *    single most frequent bigram exceeds the given permille of all
    *    bigrams are dropped ([[TextOps.repetitionStats]], the
    *    Gopher-rule redundancy filter);
    *  - `probes` adds benchmark decontamination — docs sharing ≥
    *    `minSharedShingles` trigram shingles with ANY probe doc are
    *    dropped ([[Dedup.contamination]]). Probe docs that are
    *    themselves in the corpus self-match and are dropped too (the
    *    usual "remove the benchmark from the training set" behavior);
    *  - `quota = Some((groupCol, k))` caps each group's (e.g. domain's)
    *    contribution among the dedup survivors to a deterministic
    *    hash-ordered sample of `k` docs ([[TextOps.domainQuota]]) — the
    *    corpus-mixing stage, applied after dedup so quota slots are
    *    never wasted on duplicates.
    *  - `maxBucketSize` threads the SimHash occupancy guard
    *    ([[Dedup.simhashPairs]]) into the near-dup stage — capped at
    *    [[DefaultMaxBucketSize]] by default since the uncapped band
    *    join is quadratic in hot buckets; `None` opts out.
    */
  def curate(
      docs: DataFrame,
      trainPermille: Int = 800,
      valPermille: Int = 100,
      maxHamming: Int = 3,
      hash: Hashing.HashTier = Hashing.Fast,
      maxTopBigramE3: Int = 1000,
      probes: Option[DataFrame] = None,
      minSharedShingles: Int = 5,
      quota: Option[(String, Int)] = None,
      maxBucketSize: Option[Int] = DefaultMaxBucketSize,
      checkpointDir: Option[String] = None): DataFrame = {
    // 1. quality gate — semi-join against the keep set (broadcastable;
    // degrades to a shuffled semi-join at scale)
    val keepIds = TextOps.qualityScore(docs).filter(col("keep")).select(col("doc_id"))
    var quality = docs.join(keepIds, Seq("doc_id"), "left_semi")
    // 1b. repetition gate (off at maxTopBigramE3 = 1000: the ratio
    // cannot exceed 1000)
    if (maxTopBigramE3 < 1000) {
      val keepRep = TextOps.repetitionStats(docs, hash = hash)
        .filter(col("top_bigram_ratio_e3") <= maxTopBigramE3)
        .select(col("doc_id"))
      quality = quality.join(keepRep, Seq("doc_id"), "left_semi")
    }
    // 1c. benchmark decontamination (anti-join against contaminated ids)
    probes.foreach { p =>
      val bad = Dedup.contamination(docs, p, 3, minSharedShingles, hash)
        .select(col("doc_id")).distinct()
      quality = quality.join(bad, Seq("doc_id"), "left_anti")
    }
    // 2. exact dedup — survivors are the per-text canonical (min) ids.
    // Only the ID SET is materialized (8 bytes/row — localCheckpoint
    // of the full corpus would write document bodies to block storage;
    // at 100 TB that is a second copy of the corpus). Downstream
    // consumers re-read the source parquet (columnar scan + semi-join
    // against the small checkpointed set) — re-scanning columnar input
    // is the right trade versus materializing an intermediate corpus.
    // The checkpoint still cuts the expensive part: the dedup hash
    // aggregate and quality pass execute once, not per consumer.
    val exactIds = graft.operators.Checkpoints.cut(
      Dedup.exactDedup(quality).select(col("canonical_id").as("doc_id")),
      checkpointDir)
    val exact = docs.join(exactIds, Seq("doc_id"), "left_semi")
    // 3. near-dup clusters — keep each component's minimum id (the
    // exact-dedup canonicalization lifted to fuzzy equality)
    val pairs = Dedup.simhashPairs(
      Dedup.simhashSignatures(exact, hash = hash), maxHamming, checkpointDir,
      maxBucketSize = maxBucketSize)
    val comps = Dedup.connectedComponents(pairs, exactIds,
      broadcastLabels = true, checkpointDir = checkpointDir)
    val canon = comps.filter(col("doc_id") === col("component_id")).select(col("doc_id"))
    val survivors = exact.join(canon, Seq("doc_id"), "left_semi")
    // 3b. per-group quota (corpus mixing): cap each group's surviving
    // contribution with the deterministic hash-ordered sample. The
    // quota window already hashes every surviving document's text, and
    // the split bucket is a function of that same hash — so the split
    // derives from the quota output directly (one corpus pass), rather
    // than semi-joining the source and re-hashing (measured ~1s of the
    // quota chain at sf0.1 was exactly that extra pass).
    quota match {
      case Some((gcol, k)) =>
        val kept = TextOps.domainQuota(survivors, gcol, k, hash = hash, keepKey = true)
        TextOps.splitFromBucket(
          kept.select(col("doc_id"), pmod(col("hkey"), lit(1000L)).as("bucket")),
          trainPermille, valPermille)
      case None =>
        // 4. deterministic content-hash split
        TextOps.hashSplit(survivors, trainPermille, valPermille, hash = hash)
    }
  }

  /** Leakage-safe splitting: the split is assigned per NEAR-DUP
    * CLUSTER, not per document, so a validation document can never
    * have a near-copy in train — the silent eval-contamination bug of
    * per-document hash splits (hash(textA) ≠ hash(textA′) even when
    * A ≈ A′). Clusters are connected components over banded-SimHash
    * near-dup pairs; every member hashes its cluster's canonical
    * (minimum) id into the permille bucket, so the whole cluster
    * lands in one split. Exact duplicates and singletons degenerate
    * correctly (own-id cluster). Output
    * `(doc_id, component_id, bucket, split)` — callers that also want
    * dedup keep `doc_id = component_id` representatives; keeping all
    * members is the "dedup later, split safely now" mode.
    *
    * Scale shape: the SimHash band join + CC loop dominate (both
    * audited elsewhere); the split itself is a narrow projection on
    * the 16-byte (doc, component) frame. `maxBucketSize` threads the
    * SimHash occupancy guard ([[Dedup.simhashPairs]]) into the pair
    * stage — capped at [[DefaultMaxBucketSize]] by default; at scale
    * it also thins the CC edge list, which is the loop's per-round
    * cost driver.
    */
  def leakageSafeSplit(
      docs: DataFrame,
      trainPermille: Int = 800,
      valPermille: Int = 100,
      maxHamming: Int = 3,
      hash: Hashing.HashTier = Hashing.Fast,
      maxBucketSize: Option[Int] = DefaultMaxBucketSize,
      checkpointDir: Option[String] = None): DataFrame = {
    require(trainPermille + valPermille <= 1000)
    val ids = docs.select(col("doc_id"))
    val pairs = Dedup.simhashPairs(
      Dedup.simhashSignatures(docs, hash = hash), maxHamming, checkpointDir,
      maxBucketSize = maxBucketSize)
    val comps = Dedup.connectedComponents(pairs, ids, broadcastLabels = true,
      checkpointDir = checkpointDir)
    comps
      .select(col("doc_id"), col("component_id"),
        pmod(hash(col("component_id").cast("string")), lit(1000L)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPermille, "train")
          .when(col("bucket") < trainPermille + valPermille, "val")
          .otherwise("test"))
  }
}
