package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout clustering: Morton-code correctness and the tiling
  * property that makes it a data-skipping layout (each range
  * partition covers a compact 2-D tile, so per-file min/max stats
  * prune on either dimension).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: x even, y odd") {
    val cases = Seq(
      (0L, 0L, 0L),
      (1L, 0L, 1L),
      (0L, 1L, 2L),
      (3L, 5L, 39L),      // x=011, y=101 -> 100111
      (0xFFFFL, 0L, 0x55555555L),
      (0L, 0xFFFFL, 0xAAAAAAAAL),
      (0xFFFFL, 0xFFFFL, 0xFFFFFFFFL),
      // inputs are masked to 16 bits
      (0x1FFFFL, 0L, 0x55555555L))
    val got = cases.toDF("x", "y", "want")
      .select(Layout.zValue(col("x"), col("y")), col("want"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("zValue matches a bit-by-bit reference on random coordinates") {
    def ref(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) => assert(got((x, y)) === ref(x, y)) }
  }

  test("zOrder partitions cover disjoint z-ranges and compact 2-D tiles") {
    // a full 64x64 grid, shuffled: after z-ordering into 16 range
    // partitions each partition should hold a compact tile, not a
    // full-width stripe (which is what a single-column sort produces)
    val rnd = new scala.util.Random(11)
    val pts = rnd.shuffle(
      (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)).toVector)
    val df = Layout.zOrder(pts.toDF("x", "y"), "x", "y", partitions = 16)
    val parts = df
      .select(spark_partition_id().as("pid"), col("x"), col("y"), col("zval"))
      .groupBy(col("pid"))
      .agg(
        min(col("zval")).as("zlo"), max(col("zval")).as("zhi"),
        min(col("x")).as("xlo"), max(col("x")).as("xhi"),
        min(col("y")).as("ylo"), max(col("y")).as("yhi"),
        count(lit(1)).as("n"))
      .collect()
    // range partitioning: z-intervals are pairwise disjoint
    val sorted = parts.sortBy(_.getAs[Long]("zlo"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("zhi") < b.getAs[Long]("zlo"),
          "partition z-ranges overlap")
      case _ =>
    }
    // tiling: the mean per-partition bounding box is far smaller than
    // the 64x64 plane (a 1-D sort on x would give full-height stripes
    // with area ~ 64 * 4 = 256; z-tiles land near 4096/16 = 256 but
    // bounded boxes stay under half the plane even with ragged splits)
    val areas = parts.map(r =>
      (r.getAs[Long]("xhi") - r.getAs[Long]("xlo") + 1) *
        (r.getAs[Long]("yhi") - r.getAs[Long]("ylo") + 1).toDouble)
    assert(areas.sum / areas.length < 64 * 64 / 2.0,
      s"mean tile area ${areas.sum / areas.length} not compact")
    assert(parts.map(_.getAs[Long]("n")).sum === 64L * 64L)
  }

  test("compactionPlan packs sequentially: bins never split, fill near target") {
    val files = Seq(
      ("a", "f01", 100L), ("a", "f02", 100L), ("a", "f03", 100L),
      ("a", "f04", 250L), ("a", "f05", 10L), ("a", "f06", 300L),
      ("b", "f01", 500L), ("b", "f02", 1L))
      .toDF("dir", "file", "sz")
    val plan = Layout.compactionPlan(files, "dir", "file", "sz", targetBytes = 256L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("bin")).toMap
    // dir a: cum-excl 0,100,200,300,550,560 -> bins 0,0,0,1,2,2
    assert(plan(("a", "f01")) === 0L)
    assert(plan(("a", "f02")) === 0L)
    assert(plan(("a", "f03")) === 0L)
    assert(plan(("a", "f04")) === 1L)
    assert(plan(("a", "f05")) === 2L)
    assert(plan(("a", "f06")) === 2L)
    // dirs pack independently
    assert(plan(("b", "f01")) === 0L)
    assert(plan(("b", "f02")) === 1L)
  }

  test("compaction bins reach the target before a new bin opens") {
    // any prefix that opens bin k must have packed > k*target bytes
    // before it (the closed form's fill guarantee)
    val rnd = new scala.util.Random(13)
    val files = (1 to 200).map(i => ("d", f"f$i%03d", (rnd.nextInt(400) + 1).toLong))
    val plan = Layout.compactionPlan(files.toDF("dir", "file", "sz"),
        "dir", "file", "sz", targetBytes = 1000L)
      .orderBy(col("file"))
      .collect()
    var cum = 0L
    plan.foreach { r =>
      assert(r.getAs[Long]("bin") === cum / 1000L)
      cum += r.getAs[Long]("size_bytes")
    }
    val bins = Layout.compactionBins(files.toDF("dir", "file", "sz"),
        "dir", "file", "sz", targetBytes = 1000L)
      .orderBy(col("bin")).collect()
    // every bin except the last holds >= target (it only closes once
    // the running sum crosses a multiple of target)
    bins.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("bin_bytes") >= 1000L - 400L,
        s"bin ${r.getAs[Long]("bin")} underfilled: ${r.getAs[Long]("bin_bytes")}")
    }
    assert(bins.map(_.getAs[Long]("bin_bytes")).sum === files.map(_._3).sum)
  }
}
