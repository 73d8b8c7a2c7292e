package graft

import org.apache.spark.sql.functions._

import graft.functions.NativeAggs
import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def big = (1L to 2000L).map(i => (i, s"row$i")).toDF("k", "payload")
  // every 7th key, plus some keys absent from big
  private def small = (1L to 2300L).filter(_ % 7 == 0).toDF("k")

  test("bloomSemiJoin equals plain left_semi join") {
    val exact = big.join(small, Seq("k"), "left_semi")
    val bloomed = BloomJoin.bloomSemiJoin(big, small, "k", mBits = 1 << 12, k = 5)
    assert(rowSet(bloomed) === rowSet(exact))
    assert(bloomed.columns.toSeq === big.columns.toSeq)
  }

  test("bloomAntiJoin equals plain left_anti join") {
    val exact = big.join(small, Seq("k"), "left_anti")
    val bloomed = BloomJoin.bloomAntiJoin(big, small, "k", mBits = 1 << 12, k = 5)
    assert(rowSet(bloomed) === rowSet(exact))
    assert(bloomed.columns.toSeq === big.columns.toSeq)
  }

  test("probe admits every member and prunes most non-members") {
    val bloom = small.agg(NativeAggs.bloomAgg(xxhash64(col("k")), 1 << 12, 5).as("bits"))
    val probed = big.crossJoin(bloom)
      .select(col("k"),
        BloomJoin.mightContain(col("bits"), xxhash64(col("k")), 1 << 12, 5).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // no false negatives, ever
    (7L to 2000L by 7L).foreach(k => assert(probed(k), s"member $k missed"))
    // false-positive rate well under 10% at ~14 bits/key
    val nonMembers = (1L to 2000L).filterNot(_ % 7 == 0)
    val fps = nonMembers.count(probed)
    assert(fps < nonMembers.size / 10, s"$fps false positives out of ${nonMembers.size}")
  }

  test("a tiny undersized filter still yields exact join results") {
    // 64 bits for ~330 keys: nearly everything is a "maybe"; the
    // verifying join must still deliver exact semantics
    val exact = big.join(small, Seq("k"), "left_semi")
    val bloomed = BloomJoin.bloomSemiJoin(big, small, "k", mBits = 64, k = 2)
    assert(rowSet(bloomed) === rowSet(exact))
  }

  test("null keys on the build side are ignored, not poison") {
    val smallWithNull = small.unionByName(Seq(Option.empty[Long]).toDF("k"))
    val exact = big.join(small, Seq("k"), "left_semi")
    val bloomed = BloomJoin.bloomSemiJoin(big, smallWithNull, "k", mBits = 1 << 12, k = 5)
    assert(rowSet(bloomed) === rowSet(exact))
  }

  test("bloom probe filter sits below the verifying join (prunes before the shuffle)") {
    val bloomed = BloomJoin.bloomSemiJoin(big, small, "k", mBits = 1 << 12, k = 5)
    val plan = bloomed.queryExecution.executedPlan.toString
    // the single-row bitset attaches via a broadcast nested-loop join,
    // and the probe is a plain Filter over it — upstream of the semi join
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    val filterIdx = plan.indexOf("shiftrightunsigned")
    assert(filterIdx >= 0, "probe filter not found in plan")
  }
}
