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

    val sigs = Dedup.simhashSignatures(docs, hash = Hashing.Portable)
    time("simhash sigs")(sigs.count())
    val pairs = Dedup.simhashPairs(sigs, 3)
    time("simhash pairs")(pairs.count())
    println("[scratch] n pairs: " + pairs.count())

    val pairsCk = pairs.localCheckpoint()
    time("pairs localCheckpoint") { pairsCk.count() }
    time("CC given pairs")(
      Dedup.connectedComponents(pairsCk, docs.select(col("doc_id"))).count())
    time("full d_dedup_clusters")(
      SparkEntry.queries("d_dedup_clusters")(spark, dir).count())
    spark.stop()
  }
}
