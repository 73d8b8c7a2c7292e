package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NativeAggs

/** Bloom-filter join pruning: filter the big side of a big–big
  * semi/anti join down to (probable) matches BEFORE its shuffle, so
  * the exchange carries only rows that can possibly join.
  *
  * The reference joins every ES edge endpoint against the MySQL user
  * set (`cmd/bulk/main.go` loads the full user map into memory and
  * probes it per doc). That in-memory-map shape caps out at one node's
  * RAM; the Spark-native scale shape when BOTH sides are too big to
  * broadcast is a shuffled join — and at 100 TB the dominant cost is
  * shuffling big-side rows that match nothing. A bloom filter of the
  * small(er) side's keys is tiny (mBits/8 bytes regardless of row
  * width), broadcasts where the rows themselves cannot, and removes
  * the non-matching traffic up front:
  *
  *   1. aggregate the key side into one `Array[Long]` bitset
  *      ([[NativeAggs.BloomAgg]], partial-aggregated: each map task
  *      builds a local bitset, merge is bitwise OR — the shuffle for
  *      the build is k·mBits/64 longs per task, not the key set);
  *   2. broadcast the 1-row bitset to the big side (nested-loop join
  *      on a single row = a free plan-level "attach"), probe with
  *      [[mightContain]] — pure `functions._` bit arithmetic, inside
  *      whole-stage codegen;
  *   3. the surviving rows (true matches + ~fpp false positives) flow
  *      into the EXACT semi/anti join, which removes false positives —
  *      so the operator's semantics are exactly `LEFT SEMI` /
  *      `LEFT ANTI`, bloom parameters only affect performance. That is
  *      what the DuckDB oracle pins (`b_bloom_semi`: plain IN-join).
  *
  * Probe positions use Kirsch–Mitzenmacher double hashing off one
  * xxhash64 (`pos_i = h1 + i·h2 mod m`): build and probe share the
  * closed form, no k independent hash evaluations.
  */
object BloomJoin {

  /** Probe the bitset built by [[NativeAggs.BloomAgg]] — must mirror
    * its position formula exactly. `hashed` is the xxhash64 of the
    * key; all ops below are codegen'd Spark built-ins (variable-shift
    * via the SQL `shiftright*` functions, which unlike the static
    * `functions._` faces accept a column shift amount).
    */
  def mightContain(bits: Column, hashed: Column, mBits: Int, k: Int): Column = {
    val m = lit(mBits.toLong)
    val h1 = pmod(hashed, m)
    val h2 = lit(1L) + pmod(call_function("shiftrightunsigned", hashed, lit(33)), lit((mBits - 1).toLong))
    (0 until k).map { i =>
      val pos = pmod(h1 + lit(i.toLong) * h2, m)
      val word = element_at(bits, (call_function("shiftright", pos, lit(6)) + 1).cast("int"))
      call_function("shiftrightunsigned", word, pmod(pos, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Build the 1-row bloom bitset frame over `keys.select(keyCol)`. */
  private def bloomOf(keys: DataFrame, keyCol: String, mBits: Int, k: Int): DataFrame =
    keys.select(col(keyCol))
      .filter(col(keyCol).isNotNull)
      .agg(NativeAggs.bloomAgg(xxhash64(col(keyCol)), mBits, k).as("__bloom_bits"))

  /** `big LEFT SEMI JOIN small ON big.keyCol = small.keyCol`, with the
    * big side bloom-pruned before the join's exchange. Exact: false
    * positives are removed by the verifying semi join.
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, keyCol: String,
      mBits: Int = 1 << 22, k: Int = 5): DataFrame = {
    val pruned = big
      .join(broadcast(bloomOf(small, keyCol, mBits, k)))
      .filter(mightContain(col("__bloom_bits"), xxhash64(col(keyCol)), mBits, k))
      .drop("__bloom_bits")
    // no distinct() on the verify side: semi-join semantics dedup for
    // free during the hash build, and the extra exchange+agg stage a
    // distinct would plan buys nothing
    pruned.join(small.select(col(keyCol)), Seq(keyCol), "left_semi")
  }

  /** `big LEFT ANTI JOIN small ON big.keyCol = small.keyCol`. Bloom
    * misses are DEFINITE non-members, so they bypass the join shuffle
    * entirely; only the `mightContain` survivors (matches + false
    * positives) go through the exact anti join. `big` is scanned
    * twice — at scale the scan is columnar and pruned while the
    * avoided exchange carries full rows, the right trade; callers with
    * an expensive upstream should persist it first.
    */
  def bloomAntiJoin(big: DataFrame, small: DataFrame, keyCol: String,
      mBits: Int = 1 << 22, k: Int = 5): DataFrame = {
    val bloom = broadcast(bloomOf(small, keyCol, mBits, k))
    val probe = mightContain(col("__bloom_bits"), xxhash64(col(keyCol)), mBits, k)
    val definiteMiss = big.join(bloom).filter(!probe).drop("__bloom_bits")
    val maybe = big.join(bloom).filter(probe).drop("__bloom_bits")
    definiteMiss.unionByName(
      maybe.join(small.select(col(keyCol)), Seq(keyCol), "left_anti")
        // left_anti keeps the left schema but reorders the join key
        // first; unionByName re-aligns
        .select(definiteMiss.columns.map(col).toIndexedSeq: _*))
  }
}
