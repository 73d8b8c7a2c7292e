package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.GraphOps
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

    def edges = GraphOps.edgesFromDocs(Tables.relationshipDocs(spark, dir))
    def seeds = Tables.teamMembers(spark, dir)
      .filter(col("team_id") === "N1").select(col("person_id"))

    time("warmup")(GraphOps.kHop(edges, seeds, 2).count())
    for (i <- 1 to 3) {
      time(s"j4 raw+ckpt r$i")(GraphOps.kHop(edges, seeds, 2).count())
      time(s"j4 raw nockpt r$i")(
        GraphOps.kHop(edges, seeds, 2, materializeEdges = false).count())
    }
    spark.stop()
  }
}
