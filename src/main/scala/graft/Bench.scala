package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // driver contract: bench runs at local[32]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: pays session init + parquet footer reads + JIT so
    // the first timed query measures the query, not the JVM
    try {
      SparkEntry.queries.get("q1_agg").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => }
    // best-of-N per query: reports steady-state cost, damping one-off
    // JIT/GC/scheduler noise (observed ±40% single-run variance).
    // Cheap queries get 2 trials; queries still >1s after two trials
    // get a third — the heavy tail is where a single GC/scheduler spike
    // would otherwise distort the round-over-round comparison.
    // A query that throws reports -1 (visible breakage, not a timing).
    val results = SparkEntry.queries.map { case (name, fn) =>
      def trial(): Double = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      }
      val two = Seq(trial(), trial())
      // 0.5s threshold: mid-range queries are where one GC pause moves
      // the round-over-round ratio most; sub-0.5s queries are too cheap
      // to distort the total
      val times = if (two.forall(_ >= 0) && two.min > 0.5) two :+ trial() else two
      // isolation: drop any cache/checkpoint blocks a query left behind
      // so later queries aren't timed against its memory footprint.
      // clearCache only covers df.cache/persist; localCheckpoint blocks
      // are plain persisted RDDs and need explicit unpersist.
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    // millisecond precision keeps the 100+-query line short enough to
    // survive log-tail truncation (sub-ms digits are noise anyway)
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // failed queries (-1 sentinel) must not lower the aggregate: sum
    // only successes and surface the failure count so round-over-round
    // totals stay comparable (and a broken query is loud, not hidden)
    val ok = results.values.filter(_ >= 0)
    val nFailed = results.size - ok.size
    val total = if (ok.nonEmpty) r3(ok.sum) else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$nFailed,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // stdout tails get truncated past ~100 queries — persist the full
    // JSON so every per-query time survives for round-over-round
    // regression analysis
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: $e") }
    spark.stop()
  }
}
