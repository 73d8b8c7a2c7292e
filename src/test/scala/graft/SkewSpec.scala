package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key ("hot" x 500) + a long tail
  private def fact = ((1 to 500).map(i => ("hot", i.toLong)) ++
    (1 to 50).map(i => (s"k$i", i.toLong))).toDF("k", "id")
  private def dim = (Seq("hot") ++ (1 to 50).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, s"payload$i") }.toDF("k", "p")

  test("salted join result set equals the plain join") {
    val plain = fact.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), 8, Seq("id"))
    assert(rowSet(salted) === rowSet(plain))
    assert(salted.columns.toSeq === plain.columns.toSeq)
  }

  test("salt spreads a hot key over multiple buckets, deterministically") {
    val salted = Skew.withSalt(fact.filter(col("k") === "hot"), 8, Seq("id"))
    val buckets = salted.select(col("__salt")).distinct().count()
    assert(buckets > 4) // 500 rows over 8 salts
    // deterministic: same input -> same salt assignment
    val again = Skew.withSalt(fact.filter(col("k") === "hot"), 8, Seq("id"))
    assert(rowSet(salted) === rowSet(again))
  }

  test("two-phase aggregation equals direct aggregation") {
    val direct = fact.groupBy(col("k"))
      .agg(sum(col("id")).as("s"), count(lit(1)).as("n"))
    val twoPhase = Skew.twoPhaseAgg(
      fact, Seq("k"), 8, Seq("id"),
      partial = Seq(sum(col("id")).as("ps"), count(lit(1)).as("pn")),
      merge = Seq(sum(col("ps")).as("s"), sum(col("pn")).as("n")))
    assert(rowSet(twoPhase) === rowSet(direct))
  }
}
