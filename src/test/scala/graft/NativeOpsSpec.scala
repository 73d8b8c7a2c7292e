package graft

import org.apache.spark.sql.functions._

import graft.functions.{Hashing, NativeOps}
import graft.operators.Similarity
import graft.sources.Tables

/** Differential specs: every native codegen kernel must be
  * BIT-IDENTICAL to its pure-`functions._` HOF twin — the HOF twin is
  * what the DuckDB oracle mirrors, so any drift here silently breaks
  * the cross-engine gate. Runs over the real sf0.001 fixtures (which
  * include CJK and punctuation-heavy text), not just toy rows.
  */
class NativeOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def hofPortableHash(c: org.apache.spark.sql.Column) =
    aggregate(
      transform(
        sequence(lit(1), greatest(length(c), lit(1))),
        i => ascii(c.substr(i, lit(1))).cast("long")),
      lit(7L),
      (h, x) => (h * 31 + x) % Hashing.P)

  test("native portableHash == HOF twin on all fixture documents") {
    val docs = Tables.documents(spark, sfDir)
    val mismatches = docs.select(
      NativeOps.portableHash(col("text")).as("native"),
      hofPortableHash(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(mismatches.count() === 0)
  }

  test("native portableHash == HOF twin on edge-case strings") {
    import spark.implicits._
    val edge = Seq("", " ", "a", "中文漢字", "émixed 中 ascii", "😀 emoji",
      "tab\tand\nnewline", "0123456789" * 50).toDF("s")
    val bad = edge.select(
      NativeOps.portableHash(col("s")).as("native"),
      hofPortableHash(col("s")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(bad.count() === 0)
  }

  test("native quantize/dot/norm == HOF twins on all fixture embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
    def hofQuant(c: org.apache.spark.sql.Column) =
      transform(c, x => floor(x.cast("double") * 1000000.0 + lit(0.5)).cast("long"))
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
    def hofNorm(a: org.apache.spark.sql.Column) =
      aggregate(transform(a, x => x * x), lit(0L), (acc, v) => acc + v)
    val q = emb.select(
      col("vec_id"),
      Similarity.quantize(col("embedding")).as("nq"),
      hofQuant(col("embedding")).as("hq"))
    assert(q.filter(col("nq") =!= col("hq")).count() === 0)
    val d = q.select(
      NativeOps.dotQ(col("nq"), col("nq")).as("nd"),
      hofDot(col("hq"), col("hq")).as("hd"),
      NativeOps.normQ(col("nq")).as("nn"),
      hofNorm(col("hq")).as("hn"))
    assert(d.filter(col("nd") =!= col("hd") || col("nn") =!= col("hn")).count() === 0)
  }

  test("fused shingle kernel == tokenize/slice/hash HOF chain, both tiers") {
    import graft.operators.TextOps
    val docs = Tables.documents(spark, sfDir)
    for ((tier, hofHash) <- Seq[(Boolean, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
      (true, hofPortableHash), (false, xxhash64(_)))) {
      val toks = TextOps.tokens(col("text"))
      val hofGrams = when(size(toks) >= 3,
        transform(sequence(lit(0), size(toks) - 3),
          i => hofHash(concat_ws(" ", slice(toks, i + 1, lit(3))))))
        .otherwise(array().cast("array<bigint>"))
      val bad = docs.select(
        NativeOps.shingleHashes(col("text"), 3, portable = tier).as("native"),
        hofGrams.as("hof"))
        .filter(col("native") =!= col("hof"))
      assert(bad.count() === 0, s"tier portable=$tier diverged")
    }
  }

  test("rolling window kernel (portable) == per-window fold HOF chain") {
    import graft.operators.TextOps
    val docs = Tables.documents(spark, sfDir)
    val k = 5
    val toks = TextOps.tokens(col("text"))
    val th = transform(toks, t => hofPortableHash(t))
    // direct (non-rolling) reference: fold each window's token hashes
    // left-to-right mod P — the formula the DuckDB list_reduce twin uses
    val hofWins = when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => aggregate(slice(th, i + 2, lit(k - 1)),
          element_at(th, i + 1), (a, b) => (a * 31 + b) % Hashing.P)))
      .otherwise(array().cast("array<bigint>"))
    val bad = docs.select(
      NativeOps.rollingHashes(col("text"), k, portable = true).as("native"),
      hofWins.as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(bad.count() === 0)
  }

  test("rolling window kernel (fast tier) == direct mod-2^64 fold, driver reference") {
    // ANSI mode can't express wrapping Long arithmetic in a Column
    // fold, so the mod-2^64 reference is computed driver-side: same
    // whitespace tokenization, xxhash64(42) per token, direct
    // (non-rolling) per-window fold with JVM wrapping multiply
    val k = 5
    val M = graft.functions.NativeKernels.RollM
    val rows = Tables.documents(spark, sfDir)
      .select(col("text"),
        NativeOps.rollingHashes(col("text"), k, portable = false).as("w"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val toks = r.getString(0).split("[ \t\n\f\r]+").filter(_.nonEmpty)
      val th = toks.map { tok =>
        val b = tok.getBytes("UTF-8")
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      }
      val exp =
        if (th.length < k) Array.emptyLongArray
        else (0 to th.length - k)
          .map(g => th.slice(g, g + k).reduce((a, b) => a * M + b)).toArray
      assert(r.getSeq[Long](1).toArray.sameElements(exp))
    }
  }

  test("rolling window kernel: degenerate inputs") {
    import spark.implicits._
    val edge = Seq("", "   ", "one", "one two", "a b c d e").toDF("s")
    val out = edge.select(size(NativeOps.rollingHashes(col("s"), 3, portable = true)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    // fewer than k tokens -> empty; 5 tokens at k=3 -> 3 windows
    assert(out === Seq(0, 0, 0, 0, 3))
  }

  test("native kernels survive codegen (no fallback row)") {
    // inputs derive from range's id so ConstantFolding can't collapse
    // the projection — the expressions must go through doGenCode
    val v = array((col("id") + 1).cast("float"), lit(2.0f))
    val df = spark.range(1).select(
      NativeOps.portableHash(
        concat(lit("ab"), when(col("id") === 0, "c").otherwise("x"))).as("h"),
      NativeOps.dotQ(NativeOps.quantizeE6(v), NativeOps.quantizeE6(v)).as("d"))
    // "*(n)" prefix = WholeStageCodegen stage in the simple plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen'd Project in:\n$plan")
    // hash("abc"): 7→(7*31+97)=314→(314*31+98)=9832→(9832*31+99)=304891
    assert(df.head() === org.apache.spark.sql.Row(304891L, 5000000000000L))
  }
}
