package graft

import org.apache.spark.sql.SparkSession

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

    for (i <- 1 to 4) {
      time(s"d_ngram_jaccard r$i")(
        Dedup.ngramJaccardPairs(docs, 3, 50, 500, Hashing.Portable).count())
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    for (i <- 1 to 2)
      time(s"d_minhash_lsh r$i")(
        Dedup.minhashLshPairs(docs, 3, 4, 2, 500, Hashing.Portable).count())
    spark.stop()
  }
}
