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
    time("warmup")(docs.count())

    // d_minhash_lsh stage costs (mirrors Dedup.minhashLshPairs internals)
    val sh = Dedup.shingles(docs, 3, hash = Hashing.Portable).cache()
    time("shingles")(sh.count())
    val sig = Dedup.minhashSignatures(sh, 8)
    time("minhash sigs")(sig.count())
    val banded = sig
      .withColumn("band", (col("j") / 2).cast("long"))
      .groupBy(col("doc_id"), col("band"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("j"), col("mh")))), s => s("mh")),
        lit(0L), (acc, mh) => (acc * 31 + mh % Hashing.P) % Hashing.P).as("band_sig"))
    time("band sigs")(banded.count())
    val l = banded.select(col("doc_id").as("doc_a"), col("band"), col("band_sig"))
    val r = banded.select(col("doc_id").as("doc_b"), col("band"), col("band_sig"))
    val cands = l.join(r, Seq("band", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    time("cands")(println("[scratch] n cands: " + cands.count()))
    for (i <- 1 to 3)
      time(s"full d_minhash_lsh r$i")(
        Dedup.minhashLshPairs(docs, 3, 4, 2, 500, Hashing.Portable).count())
    for (i <- 1 to 2)
      time(s"full d_simhash_pairs r$i")(
        Dedup.simhashPairs(Dedup.simhashSignatures(docs, hash = Hashing.Portable), 3).count())
    sh.unpersist()
    spark.stop()
  }
}
