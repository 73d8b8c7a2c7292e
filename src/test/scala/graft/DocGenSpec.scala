package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{DocGen, DocGenSource}

/** DataSource V2 connector: pushdown, pruning, and determinism gates —
  * the custom-source tier's PlanQualitySpec.
  */
class DocGenSpec extends SparkSpec {
  import spark.implicits._

  private def read(rows: Long = 1000L, partitions: Int = 8): DataFrame =
    spark.read.format(classOf[DocGenSource].getName)
      .option("rows", rows).option("partitions", partitions).load()

  test("generates the closed-form corpus deterministically") {
    val df = read(rows = 100, partitions = 4)
    assert(df.count() === 100)
    val r7 = df.filter(col("doc_id") === 7).head()
    assert(r7.getString(1) === DocGen.sourceOf(7))
    assert(r7.getString(2) === DocGen.textOf(7))
    // rerun-stable
    assert(rowSet(read(rows = 100, partitions = 4)) === rowSet(read(rows = 100, partitions = 7)))
  }

  test("doc_id filter pushes down and prunes input partitions") {
    // 1000 rows / 8 partitions = 125 per slice; doc_id >= 900 survives
    // only in the last slice -> exactly 1 task
    val filtered = read().filter(col("doc_id") >= 900)
    assert(filtered.count() === 100)
    assert(filtered.rdd.getNumPartitions === 1)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(doc_id,900)"),
      s"filter did not reach the scan:\n$plan")
    // the pushed filter is not re-evaluated wastefully: rows below the
    // bound are never generated (range clipped at the reader)
    val eq = read().filter(col("doc_id") === 423)
    assert(eq.rdd.getNumPartitions === 1 && eq.count() === 1)
  }

  test("column pruning reaches the reader schema") {
    val ids = read().select(col("doc_id"))
    val plan = ids.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"expected 1-column read schema:\n$plan")
    assert(ids.agg(sum(col("doc_id"))).head().getLong(0) === (0L until 1000L).sum)
  }

  test("non-pushable predicates stay as residual filters, results correct") {
    val df = read(rows = 200).filter(col("source") === "src3")
    // ids with id % 20 == 3 -> 10 of 200
    assert(df.count() === 10)
    assert(df.collect().forall(_.getString(1) == "src3"))
  }

  test("micro-batch stream: rate-limited batches replay the exact batch corpus") {
    val q = spark.readStream.format(classOf[DocGenSource].getName)
      .option("rows", 1000).option("partitions", 4).option("rowsPerBatch", 300)
      .load()
      .writeStream.format("memory").queryName("dgen_stream").start()
    try {
      // processAllAvailable only covers data admitted at invocation
      // time — loop until the admitted corpus stops growing
      var prev = -1L
      var cur = 0L
      while (cur != prev) {
        q.processAllAvailable()
        prev = cur
        cur = spark.table("dgen_stream").count()
      }
      val streamed = rowSet(spark.table("dgen_stream"))
      assert(streamed === rowSet(read(rows = 1000)))
      // admission control actually batched: 1000 rows / 300 per trigger
      // -> at least 4 committed micro-batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4)
    } finally q.stop()
  }

  test("micro-batch stream honors the pushed doc_id range") {
    // pushFilters claims doc_id bounds as fully applied (non-residual),
    // so the stream must clip to [lo,hi) itself — a leak here emits
    // rows the filter promised to remove, with nothing re-checking them
    val q = spark.readStream.format(classOf[DocGenSource].getName)
      .option("rows", 1000).option("partitions", 4).option("rowsPerBatch", 300)
      .load()
      .filter(col("doc_id") >= 850 && col("doc_id") < 950)
      .writeStream.format("memory").queryName("dgen_range").start()
    try {
      var prev = -1L; var cur = 0L
      while (cur != prev) {
        q.processAllAvailable()
        prev = cur; cur = spark.table("dgen_range").count()
      }
      val ids = spark.table("dgen_range").select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq === (850L until 950L))
    } finally q.stop()
  }

  test("admission control: the engine ReadLimit overrides rowsPerBatch") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import graft.sources.{DocGenOffset, DocGenMicroBatchStream}
    val s = new DocGenMicroBatchStream(1000L, 4, 250L, DocGen.Schema)
    // trigger-level maxRows wins over the option
    assert(s.latestOffset(DocGenOffset(0L), ReadLimit.maxRows(7L)) === DocGenOffset(7L))
    // allAvailable admits the remainder
    assert(s.latestOffset(DocGenOffset(40L), ReadLimit.allAvailable()) === DocGenOffset(1000L))
    // composite: tightest max-shaped member
    assert(s.latestOffset(DocGenOffset(0L),
      ReadLimit.compositeLimit(Array(ReadLimit.minRows(1L, 0L), ReadLimit.maxRows(9L))))
      === DocGenOffset(9L))
    // uninterpretable (min-only) limit falls back to rowsPerBatch
    assert(s.latestOffset(DocGenOffset(0L), ReadLimit.minRows(1L, 0L)) === DocGenOffset(250L))
    // pushed range bounds both ends of the stream
    val ranged = new DocGenMicroBatchStream(1000L, 4, 250L, DocGen.Schema, 300L, 600L)
    assert(ranged.initialOffset() === DocGenOffset(300L))
    assert(ranged.latestOffset(DocGenOffset(500L), ReadLimit.allAvailable()) === DocGenOffset(600L))
  }

  test("micro-batch stream resumes from the committed offset after restart") {
    // memory sink can't recover a checkpoint — use the (fault-tolerant)
    // file sink and read the output directory back
    val ckpt = java.nio.file.Files.createTempDirectory("dgen_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("dgen_out").toString
    def start() = spark.readStream.format(classOf[DocGenSource].getName)
      .option("rows", 900).option("partitions", 4).option("rowsPerBatch", 400)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      var prev = -1L; var cur = 0L
      while (cur != prev) {
        q.processAllAvailable()
        prev = cur
        cur = spark.read.parquet(out).count()
      }
    }
    val q1 = start()
    drain(q1); q1.stop()
    assert(spark.read.parquet(out).count() === 900)
    // restart against the same checkpoint: the committed offset is
    // final, nothing re-emitted (a replay would duplicate ids)
    val q2 = start()
    try {
      drain(q2)
      val ids = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0))
      assert(ids.length === 900 && ids.length === ids.distinct.length,
        "restart re-emitted committed ids")
    } finally q2.stop()
  }
}
