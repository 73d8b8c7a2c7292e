package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("j_asof_native")(spark, dir)
    println("=== analyzed ===\n" + df.queryExecution.analyzed.toString.take(2500))
    println("=== optimized ===\n" + df.queryExecution.optimizedPlan.toString.take(2500))
    spark.stop()
  }
}
