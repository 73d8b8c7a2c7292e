package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f)),
    (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")

  test("quantize + exact integer dot/norm") {
    val q = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(q(0L) === Seq(1000000L, 0L))
    assert(q(1L) === Seq(900000L, 100000L))
    val dot = emb.filter(col("vec_id") === 0).crossJoin(
      emb.filter(col("vec_id") === 1).select(col("embedding").as("e2")))
      .select(Similarity.dotQ(
        Similarity.quantize(col("embedding")),
        Similarity.quantize(col("e2")))).head().getLong(0)
    assert(dot === 1000000L * 900000L)
  }

  test("brute-force cosine top-k ranks by cosine with id tiebreak") {
    val out = Similarity.cosineTopK(emb, col("vec_id") === 0, k = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    // cos(0,1)=0.9939 > cos(0,2)=0
    assert(out.map(r => (r._1, r._2, r._4)).toSeq === Seq((0L, 1L, 1L), (0L, 2L, 2L)))
  }

  test("cosine near-dup pairs finds exactly the one pair above 0.99") {
    val out = Similarity.cosineNearDupPairs(emb, cosE6 = 990000L)
    assert(rowSet(out) === Set(Seq(0L, 1L, 900000000000L)))
  }

  test("LSH buckets: identical vectors always share a bucket; probe finds them") {
    val dup = Seq(
      (0L, Array(0.5f, 0.5f)),
      (1L, Array(0.5f, 0.5f)),
      (2L, Array(-0.5f, -0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.lshBucketedNeighbors(dup, col("vec_id") === 0, planes = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(out.map(_._2).contains(1L))
    assert(!out.map(_._2).contains(2L)) // opposite sign vector lands in the complement bucket
  }
}
