package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the hand tools for when AQE's runtime
  * skew-join splitting isn't available (non-sort-merge plans, pre-AQE
  * stages) or when a key's fan-out is known up front.
  *
  * Salting contract: the *fact* (large, skewed) side gets a
  * deterministic per-row salt in `[0, saltFactor)`; the *dim* side is
  * replicated `saltFactor`× so every `(key, salt)` bucket finds its
  * match. Join key becomes `(key, salt)` — a hot key's rows now spread
  * over `saltFactor` reducers. Deterministic salt (hash of the whole
  * row's stable id columns, not `rand()`) keeps retries and
  * speculative tasks idempotent.
  */
object Skew {

  /** Add a deterministic salt column derived from `idCols`. */
  def withSalt(df: DataFrame, saltFactor: Int, idCols: Seq[String]): DataFrame = {
    // saltFactor = 0 would make pmod return NULL for every row and the
    // downstream join silently empty — fail fast instead
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    df.withColumn("__salt", pmod(xxhash64(idCols.map(col): _*), lit(saltFactor)).cast("int"))
  }

  /** Replicate each row `saltFactor`× with salt 0..saltFactor-1. */
  def replicated(df: DataFrame, saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    df.withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
  }

  /** Skew-safe inner equi-join: salt the fact side, replicate the dim
    * side, join on keys + salt. Result is identical to
    * `fact.join(dim, keys)`; the shuffle for a hot key spreads over
    * `saltFactor` partitions.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      factIdCols: Seq[String]): DataFrame = {
    val f = withSalt(fact, saltFactor, factIdCols)
    val d = replicated(dim, saltFactor)
    f.join(d, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * `(keys, salt)`, then final-aggregate on `keys`. For algebraic
    * aggregates Spark's own partial aggregation usually suffices; this
    * helps when the *grouped values* are the skew (e.g. collect-style
    * or high-cardinality distinct per hot key).
    *
    * `partial` computes per-salt partials, `merge` combines partials —
    * caller guarantees `merge ∘ partial` ≡ direct aggregation
    * (associativity).
    */
  def twoPhaseAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      idCols: Seq[String],
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    withSalt(df, saltFactor, idCols)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
