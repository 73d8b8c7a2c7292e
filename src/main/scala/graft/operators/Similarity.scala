package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Numeric discipline: embeddings are quantized per-element with
  * `floor(x*1e6 + 0.5)` into BIGINTs, so dot products and norms are
  * exact integers — order-insensitive, engine-portable, and still
  * rank-equivalent to float cosine at 1e-6 resolution. Cosine itself
  * (`dot / (√n_a·√n_b)`) is then a deterministic double (single IEEE
  * divide of exact ints) used for ranking only; persisted outputs are
  * the integer dot products.
  *
  * Scale paths:
  *  - [[cosineTopK]] — brute force: broadcast the (small) query set,
  *    one pass over the corpus, per-query top-k via window. At 100 TB
  *    this is the exact baseline — a single scan, no shuffle of the
  *    corpus, only k rows per (query, partition) survive the partial
  *    top-k.
  *  - [[lshBucketedNeighbors]] — sign-random-projection LSH: 16
  *    deterministic integer hyperplanes → 16-bit bucket; candidates
  *    collide on the bucket. Sub-linear probe cost; recall tunable by
  *    planes/probes. The bucket join shuffles only (bucket, id, vec).
  */
object Similarity {

  /** `floor(x·1e6 + 0.5)` per element — the exactness contract.
    * Native codegen kernel; the HOF twin
    * `transform(vec, x => floor(x.cast("double")*1e6 + 0.5).cast("long"))`
    * is bit-identical (differential-tested in SimilaritySpec).
    */
  def quantize(vec: Column): Column = graft.functions.NativeOps.quantizeE6(vec)

  /** Exact integer dot product of two quantized vectors (native kernel —
    * the hot loop of every pairwise scorer).
    */
  def dotQ(a: Column, b: Column): Column = graft.functions.NativeOps.dotQ(a, b)

  /** Squared norm of a quantized vector (native kernel). */
  def normQ(a: Column): Column = graft.functions.NativeOps.normQ(a)

  private def withQuant(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id"),
      quantize(col("embedding")).as("q"))
      .withColumn("nq", normQ(col("q")))

  /** Brute-force cosine top-k: for each query vector (`queryPred`
    * selects the query subset), the `k` nearest corpus vectors by
    * cosine, self excluded, ties broken by neighbor id. Output:
    * `(query_id, neighbor_id, dot_q, rank)` — all exact integers.
    */
  def cosineTopK(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val corpus = withQuant(embeddings)
    val queries = corpus.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nq").as("qn"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        dotQ(col("qq"), col("q")).as("dot_q"),
        (col("qn").cast("double") * col("nq").cast("double")).as("nn"))
      .withColumn("cos", col("dot_q").cast("double") / sqrt(col("nn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dot_q"), col("rank"))
  }

  /** Deterministic integer hyperplane weight for (dimension i, plane j):
    * `((i+1)*1103515245 + (j+1)*12345) mod 2001 − 1000`. Same closed
    * form in the SQL oracle — no RNG state to ship.
    */
  def planeWeight(i: Column, j: Column): Column =
    ((i + 1) * 1103515245L + (j + 1) * 12345L) % 2001L - 1000L

  /** Sign-random-projection bucket id: bit `j` of the bucket is the
    * sign of `Σ_i q_i · w(i,j)` over `planes` integer hyperplanes.
    */
  def lshBucket(q: Column, planes: Int): Column = {
    val bits = (0 until planes).map { j =>
      val s = aggregate(
        zip_with(q, sequence(lit(0), size(q) - 1), (x, i) => x * planeWeight(i, lit(j.toLong))),
        lit(0L), (acc, v) => acc + v)
      when(s >= 0, lit(1L) * (1L << j)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: queries probe only their own bucket. Returns all
    * same-bucket candidates with exact integer dot products —
    * `(query_id, neighbor_id, dot_q)`. Recall < 1 by construction; the
    * scale path for corpora where brute force is off-budget.
    */
  def lshBucketedNeighbors(embeddings: DataFrame, queryPred: Column, planes: Int = 16): DataFrame = {
    val corpus = withQuant(embeddings).withColumn("bucket", lshBucket(col("q"), planes))
    val queries = corpus.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("bucket"))
    corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        dotQ(col("qq"), col("q")).as("dot_q"))
  }

  /** IVF (inverted-file) approximate nearest neighbors — the coarse-
    * quantizer scale path: assign every corpus vector to its nearest of
    * `nCentroids` centroid cells; queries probe only their `nProbe`
    * nearest cells; exact top-k runs within the probed candidates.
    *
    * Centroids here are the deterministic stand-in `vec_id <
    * nCentroids` (a production build plugs k-means|| output into the
    * same frame — everything downstream is unchanged). The centroid set
    * broadcasts; assignment is one pass over the corpus (broadcast
    * nested-loop × nCentroids, then a per-vector argmax window); the
    * candidate join shuffles on the cell id — recall is tunable by
    * nProbe, cost scales with corpus/nCentroids per probe instead of
    * the whole corpus.
    */
  def ivfTopK(
      embeddings: DataFrame,
      queryPred: Column,
      nCentroids: Int,
      nProbe: Int,
      k: Int): DataFrame = {
    val corpus = withQuant(embeddings)
    val cents = corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("q").as("cq"), col("nq").as("cnq"))
    def nearestCells(vecs: DataFrame, n: Int): DataFrame = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid").asc)
      vecs.join(broadcast(cents))
        .withColumn("ccos",
          dotQ(col("q"), col("cq")).cast("double") /
            sqrt(col("nq").cast("double") * col("cnq").cast("double")))
        .withColumn("crn", row_number().over(w))
        .filter(col("crn") <= n)
        .drop("cq", "cnq", "ccos", "crn")
    }
    val assigned = nearestCells(corpus, 1)
    val probes = nearestCells(corpus.filter(queryPred), nProbe)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nq").as("qn"), col("cid"))
    val scored = assigned.join(probes, Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        dotQ(col("qq"), col("q")).as("dot_q"),
        (col("qn").cast("double") * col("nq").cast("double")).as("nn"))
      .withColumn("cos", col("dot_q").cast("double") / sqrt(col("nn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dot_q"), col("rank"))
  }

  /** Embedding near-duplicate pairs: all pairs with cosine ≥ τ.
    * Exact all-pairs within LSH buckets when `blocked`, else brute
    * force (n² — correctness oracle / small corpora only).
    * `cosE6` threshold is in 1e-6 units (e.g. 950000 = 0.95).
    * Output `(id_a, id_b, dot_q)`, `id_a < id_b`.
    */
  def cosineNearDupPairs(embeddings: DataFrame, cosE6: Long, blocked: Boolean = false): DataFrame = {
    val corpus = withQuant(embeddings)
    val a = corpus.select(col("vec_id").as("id_a"), col("q").as("q_a"), col("nq").as("n_a"))
    val b = corpus.select(col("vec_id").as("id_b"), col("q").as("q_b"), col("nq").as("n_b"))
    // blocked: equi-join on LSH bucket (the scale path). Unblocked: a real
    // cross join — NOT a constant-key equi-join, which would hash every
    // row into one partition; crossJoin keeps the left side partitioned.
    val paired =
      if (blocked)
        a.withColumn("bucket", lshBucket(col("q_a"), 16))
          .join(b.withColumn("bucket", lshBucket(col("q_b"), 16)), Seq("bucket"))
      else a.crossJoin(b)
    paired.filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"), col("id_b"),
        dotQ(col("q_a"), col("q_b")).as("dot_q"),
        (col("n_a").cast("double") * col("n_b").cast("double")).as("nn"))
      .filter(col("dot_q").cast("double") >= lit(cosE6.toDouble / 1e6) * sqrt(col("nn")))
      .select(col("id_a"), col("id_b"), col("dot_q"))
  }
}
