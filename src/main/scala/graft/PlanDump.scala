package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only plan capture (not part of the driver contract):
  * `runMain graft.PlanDump <outDir> <suffix> <query> [query...]`
  * writes `.explain("formatted")` of each named [[SparkEntry.queries]]
  * entry to `<outDir>/<query>_<suffix>.txt` — the optimization-round
  * evidence files (`plans/rNN/<query>_before.txt` / `_after.txt`).
  *
  * Caveat (inherent to the iterative operators): driver-loop queries
  * materialize their rounds while the DataFrame is BUILT, so the
  * captured plan is the final post-checkpoint composition — the
  * per-round shape lives in the operator code and the scaladoc, not
  * in this file. Row-pipeline queries capture end to end.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    Files.createDirectories(outDir)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${n}_$suffix.txt (${txt.length} chars)")
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
