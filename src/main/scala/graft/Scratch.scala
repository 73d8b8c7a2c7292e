package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only profiling harness (not part of the driver contract). */
object Scratch {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)
    time("warmup count")(docs.count())
    val sh = Dedup.shingles(docs, 3, hash = Hashing.Portable)
    time("shingles (native portable)")(sh.count())
    time("minhash sigs (single-pass)")(Dedup.minhashSignatures(sh, 8).count())
    time("ngram jaccard")(
      Dedup.ngramJaccardPairs(docs, 3, 50, 500, Hashing.Portable).count())
    val emb = Tables.embeddings(spark, dir)
    time("sim near-dup (native dot)")(
      graft.operators.Similarity.cosineNearDupPairs(emb, 400000L).count())
    time("simhash pairs")(
      Dedup.simhashPairs(Dedup.simhashSignatures(docs, hash = Hashing.Portable), 3).count())
    val j4 = SparkEntry.queries("j4_two_hop")(spark, dir)
    time("j4_two_hop")(j4.count())
    val plan = j4.queryExecution.executedPlan.toString
    println("[scratch] j4 ReusedExchange count: " + "ReusedExchange".r.findAllIn(plan).size)
    println("[scratch] j4 scan count: " + "Scan parquet".r.findAllIn(plan).size)
    spark.stop()
  }
}
