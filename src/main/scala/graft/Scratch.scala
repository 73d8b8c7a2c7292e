package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness (not part of the driver contract):
  * `runMain graft.Scratch <query> [query...]` times each named
  * [[SparkEntry.queries]] entry 3× at `SPARK_GRAFT_SF_DIR`, clearing
  * cache/checkpoint blocks between trials (same isolation as Bench).
  */
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // keep operator-level telemetry (e.g. connectedComponents
    // rounds-to-fixpoint) visible under the quiet root level
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.operators", org.apache.logging.log4j.Level.INFO)

    val names = if (args.nonEmpty) args.toSeq else Seq("d_ngram_jaccard")
    time("warmup")(graft.sources.Tables.documents(spark, dir).count())
    // dev variants not in the registry (profiling knob settings)
    val extra: Map[String, org.apache.spark.sql.DataFrame] = Map(
      // the corpus-scale opt-out: no instance materialization — the
      // generator re-runs per consumer instead of caching ~Σn rows
      // per token (the sf10 storage-bound case, PERF_r17)
      "gopher_nomat" -> graft.operators.TextOps.gopherRepetition(
        graft.sources.Tables.documents(spark, dir),
        materializeInstances = false))
    for (n <- names; i <- 1 to 3) {
      // time the BUILD too (the Bench rule): iterative operators run
      // their fixpoint jobs eagerly while the DataFrame is constructed
      // (Checkpoints.cut is eager), so a timer around only the final
      // count would miss the loop entirely.
      // un-pruned plan — the Bench rule (r16): plain count() lets
      // Catalyst collapse projection-final chains to a metadata count
      time(s"$n r$i") {
        val df = extra.getOrElse(n, SparkEntry.queries(n)(spark, dir))
        df.queryExecution.toRdd.count()
      }
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
