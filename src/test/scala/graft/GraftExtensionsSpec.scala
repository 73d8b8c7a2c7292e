package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftbridge.Bridge

/** The `spark.sql.extensions=graft.GraftExtensions` build path: apply
  * the injections to a live session's registry and call every function
  * from SQL text.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("injected functions resolve and compute from SQL text") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    Bridge.applyFunctionInjections(ext, spark)
    val r = spark.sql(
      "SELECT graft_portable_hash('ab') AS h, " +
        "graft_dot_q(array(2L, 3L), array(4L, 5L)) AS d, " +
        "graft_norm_q(array(3L, 4L)) AS n, " +
        "graft_quantize_e6(array(CAST(0.5 AS FLOAT))) AS q, " +
        "graft_shingle_hashes('a b c d', 3, true) AS sh").head()
    assert(r.getLong(0) === 9832L)
    assert(r.getLong(1) === 23L)
    assert(r.getLong(2) === 25L)
    assert(r.getSeq[Long](3) === Seq(500000L))
    // two 3-grams of a 4-token doc, identical to the Column-level op
    import spark.implicits._
    val viaColumn = Seq("a b c d").toDF("t")
      .select(graft.functions.NativeOps.shingleHashes(org.apache.spark.sql.functions.col("t"), 3, portable = true))
      .head().getSeq[Long](0)
    assert(r.getSeq[Long](4) === viaColumn)
  }

  test("non-literal shingle params are rejected with a clear error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    Bridge.applyFunctionInjections(ext, spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes('a b', length('xx'), true)").head()
    }
    assert(e.getMessage.contains("literal"))
  }
}
