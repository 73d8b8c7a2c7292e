package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash functions for the dedup / fingerprint / MinHash operators.
  *
  * Two tiers:
  *  - [[fastHash]] — `xxhash64`, Spark's codegen'd 64-bit hash. The
  *    production path at 100 TB: one native expression, no array
  *    materialization.
  *  - [[portableHash]] — a 31-polynomial rolling hash mod 2^30-scale
  *    prime, expressed with higher-order functions only. Every engine
  *    with `split`/`transform`/`aggregate`-style list lambdas (DuckDB,
  *    Trino, Spark) computes bit-identical values, which is what the
  *    cross-engine oracle needs. Defined for ASCII text (codepoint
  *    folding); still deterministic for any UTF-8 input.
  *
  * Operators take the hash as a `Column => Column` parameter so callers
  * pick the tier; oracle-facing queries pass [[portableHash]], scale
  * paths keep the [[fastHash]] default.
  */
object Hashing {

  /** Modulus: prime < 2^30 so `h*31 + c` and MinHash's `a*h + b` stay
    * far from Long overflow.
    */
  val P: Long = 1000000007L

  /** Hash tier as a value: usable directly as a `Column => Column`,
    * while letting kernelized operators (shingling) dispatch to the
    * fused native path for the same tier.
    */
  sealed abstract class HashTier extends (Column => Column) {
    def portable: Boolean
  }
  case object Fast extends HashTier {
    def apply(c: Column): Column = fastHash(c)
    def portable: Boolean = false
  }
  case object Portable extends HashTier {
    def apply(c: Column): Column = portableHash(c)
    def portable: Boolean = true
  }

  /** xxhash64 — the scale-path default. */
  def fastHash(c: Column): Column = xxhash64(c)

  /** Engine-portable polynomial rolling hash:
    * `h_0 = 7; h_i = (31*h_{i-1} + codepoint_i) mod P`.
    *
    * Served by the native codegen'd [[NativeOps.portableHash]] — a tight
    * codepoint loop, ~10× the interpreted-HOF throughput at sf0.1.
    * [[portableHashHof]] keeps the pure-`functions._` formulation as the
    * differential-test twin (both must stay bit-identical).
    *
    * DuckDB twin (see SparkEntry oracle fragments):
    * {{{
    * list_reduce(list_prepend(7, list_transform(string_split(s, ''),
    *   c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a*31 + b) % 1000000007)
    * }}}
    */
  def portableHash(c: Column): Column = NativeOps.portableHash(c)

  /** The higher-order-function formulation of [[portableHash]] (slow
    * path, kept as the bit-identity oracle for the native kernel).
    */
  def portableHashHof(c: Column): Column =
    aggregate(
      // position-indexed char extraction, NOT split(c, ""): Java regex
      // split with limit -1 keeps a trailing empty string that DuckDB's
      // string_split does not produce. greatest(...,1) guards the
      // empty-string input (sequence(1,0) would count *down* in Spark).
      transform(
        sequence(lit(1), greatest(length(c), lit(1))),
        i => ascii(c.substr(i, lit(1))).cast("long")),
      lit(7L),
      (h, x) => (h * 31 + x) % P)

  /** MinHash permutation `j` applied to an already-hashed shingle:
    * `(a_j * h + b_j) mod P` with deterministic per-permutation
    * coefficients (same closed form in the SQL oracle).
    */
  def minhashPerm(h: Column, j: Column): Column = {
    val a = ((j + 1) * 961748941L) % P
    val b = ((j + 1) * 982451653L) % P
    (a * (h % P) + b) % P
  }
}
