package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan
  * pruning. At 100 TB the scan you never run is the cheapest one —
  * parquet readers skip row groups/files whose min/max stats exclude
  * the predicate, but those stats only help if rows filtered together
  * are STORED together. Z-order (Morton) interleaving linearizes a 2-D
  * key space so range-partitioning + in-partition sorting on the
  * z-value gives every file a tight bounding box in BOTH dimensions —
  * the standard layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`)
  * re-expressed as plain Spark primitives.
  *
  * The z-value is pure closed-form bit arithmetic (magic-mask bit
  * spreading, no loops, no UDF) — fully codegen'd in Spark and exactly
  * reproducible in any engine with 64-bit integer ops (the DuckDB
  * oracle runs the same expression).
  */
object Layout {

  /** Spread the low 16 bits of `v` to even bit positions (Morton
    * spreading via the classic mask cascade).
    */
  private def spread16(v: Column): Column = {
    val a = v.bitwiseAND(lit(0xFFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FFL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit coordinates: x in even bits,
    * y in odd bits. Inputs are masked to their low 16 bits.
    */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1)).as("zval")

  /** Cluster `df` for 2-D scan pruning: range-partition on the
    * z-value of `(xCol, yCol)` and sort each partition by it. Written
    * as parquet, every output file then covers a compact square-ish
    * tile of the (x, y) plane, so min/max stats prune files for
    * predicates on EITHER dimension — a single-column sort would only
    * prune on that column.
    *
    * One shuffle (the range exchange, driven by sampled split points);
    * the sort is in-partition — no global sort materializes.
    */
  def zOrder(
      df: DataFrame,
      xCol: String,
      yCol: String,
      partitions: Int): DataFrame = {
    val keyed = df.withColumn("zval", zValue(col(xCol), col(yCol)))
    keyed
      .repartitionByRange(partitions, col("zval"))
      .sortWithinPartitions(col("zval"))
  }

  /** Small-file compaction planner — the other half of table
    * maintenance next to [[zOrder]]: assign each input file to an
    * output bin of ~`targetBytes`, preserving source order within a
    * directory (so downstream min/max stats stay as tight as the
    * input's). The assignment is the closed-form sequential pack
    *
    *   bin = exclusive_running_sum(size) div targetBytes
    *
    * — every bin's payload lands in [targetBytes, targetBytes + max
    * file size) except the last, bins never split a file, and the rule
    * is a pure window expression: deterministic, engine-portable
    * (DuckDB oracle runs the identical window), no driver-side greedy
    * loop over a collected listing.
    *
    * Scale shape: this plans over file METADATA (path, size), not
    * data — a 100 TB table is ~10⁶ listings, one shuffle on `dirCol`
    * with an in-partition sort. Per-directory packing is inherently
    * sequential (each bin depends on the running sum), so the
    * directory/partition key IS the parallelism knob, exactly like
    * [[TextOps.packSequences]]'s shards.
    */
  def compactionPlan(
      files: DataFrame,
      dirCol: String,
      fileCol: String,
      sizeCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(dirCol)).orderBy(col(fileCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .select(col(dirCol), col(fileCol), col(sizeCol).cast("long").as("__sz"))
      .withColumn("__cum", sum(col("__sz")).over(w) - col("__sz"))
      .select(col(dirCol), col(fileCol), col("__sz").as("size_bytes"),
        expr(s"__cum div ${targetBytes}L").as("bin"))
  }

  /** Roll the per-file plan up to one row per output bin (what the
    * rewrite job actually schedules): file count and payload bytes.
    */
  def compactionBins(
      files: DataFrame,
      dirCol: String,
      fileCol: String,
      sizeCol: String,
      targetBytes: Long): DataFrame =
    compactionPlan(files, dirCol, fileCol, sizeCol, targetBytes)
      .groupBy(col(dirCol), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("size_bytes")).as("bin_bytes"))
}
