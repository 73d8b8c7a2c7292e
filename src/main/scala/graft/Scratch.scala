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

    // curation stage costs
    val keepIds = graft.operators.TextOps.qualityScore(docs).filter(col("keep")).select(col("doc_id"))
    val quality = docs.join(keepIds, Seq("doc_id"), "left_semi")
    val exactIds = Dedup.exactDedup(quality).select(col("canonical_id").as("doc_id"))
    val exact = quality.join(exactIds, Seq("doc_id"), "left_semi")
    time("quality+exact (uncheckpointed)")(exact.count())
    val exactCk = time("exact localCheckpoint")(exact.localCheckpoint())
    val pairs = Dedup.simhashPairs(
      Dedup.simhashSignatures(exactCk, hash = Hashing.Portable), 3)
    time("pairs over exact")(pairs.count())

    // instrumented CC: count rounds
    {
      val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
        .localCheckpoint()
      var labels = exactCk.select(col("doc_id"), col("doc_id").as("label"))
      var changed = 1L
      var round = 0
      while (changed > 0 && round < 20) {
        val t0 = System.nanoTime()
        val neighborMin = edges
          .join(labels, edges("v") === labels("doc_id"))
          .groupBy(col("u").as("doc_id"))
          .agg(min(col("label")).as("nmin"))
        val stepped = labels
          .join(neighborMin, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("label").as("old_label"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        val lmap = stepped.select(col("doc_id").as("ld"), col("label").as("ll"))
        val jumped = stepped
          .join(lmap, stepped("label") === col("ld"), "left_outer")
          .select(stepped("doc_id"), col("old_label"),
            least(stepped("label"), coalesce(col("ll"), stepped("label"))).as("label"))
          .localCheckpoint()
        changed = jumped.filter(col("label") < col("old_label")).count()
        labels = jumped.select(col("doc_id"), col("label"))
        round += 1
        println(f"[scratch] CC round $round: changed=$changed  ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    time("CC")(Dedup.connectedComponents(pairs, exactCk.select(col("doc_id")), broadcastLabels = true).count())
    time("full pipe_curation")(SparkEntry.queries("pipe_curation")(spark, dir).count())
    spark.stop()
  }
}
