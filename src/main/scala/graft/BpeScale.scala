package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only BPE training-depth probe (not part of the driver
  * contract): `runMain graft.BpeScale [steps steps...]` times
  * [[graft.operators.TextOps.bpeMerges]] at increasing merge-step
  * counts over `SPARK_GRAFT_SF_DIR`'s documents, printing wall time,
  * learned-merge count, and end-state vocabulary size per setting.
  *
  * What it adjudicates: the loop's claim is that per-step cost is
  * VOCAB-bound (the corpus is scanned once; each step runs on the
  * (word, n, syms) table). If wall time grows superlinearly in steps,
  * either the symbol table is densifying (vocab growth) or per-step
  * fixed job overhead dominates — the printed per-step seconds
  * separate the two: flat per-step ⇒ overhead-dominated, rising ⇒
  * state growth.
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stepCounts = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(6, 16, 32, 64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, dir)
    docs.count() // warm the scan
    println(f"[bpe-scale] ${"steps"}%6s ${"wall_s"}%8s ${"s/step"}%8s " +
      f"${"merges"}%7s ${"pieces"}%8s")
    for (steps <- stepCounts) {
      val t0 = System.nanoTime()
      val merges = graft.operators.TextOps.bpeMerges(docs, steps = steps)
      val nMerges = merges.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // end-state segmentation size: total pieces the trained
      // vocabulary induces on its own corpus (vocab-growth signal)
      val pieces = graft.operators.TextOps
        .bpeTrainSegmentation(docs, steps = steps)
        .agg(sum(col("n_pieces") * col("n"))).head().getLong(0)
      println(f"[bpe-scale] $steps%6d $wall%8.2f ${wall / steps}%8.3f " +
        f"$nMerges%7d $pieces%8d")
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
