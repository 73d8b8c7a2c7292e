package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sharded

/** Pure range-routing specs (no database needed): the predicates must
  * tile each shard's keyspace exactly — inclusive, gap-free,
  * overlap-free — across the full uint64 range.
  */
class ShardedSpec extends AnyFunSuite {

  private val boundRe = """>= (\d+) AND .* <= (\d+)""".r.unanchored

  private def bounds(p: String): (BigInt, BigInt) = p match {
    case boundRe(l, h) => (BigInt(l), BigInt(h))
  }

  test("reference shard layout covers uint64 exactly") {
    val shards = Sharded.referenceShards("jdbc:one", "jdbc:two")
    assert(shards.head.lo === BigInt(0))
    assert(shards.head.hi === BigInt("9223372036854775807"))
    assert(shards(1).lo === BigInt("9223372036854775808"))
    assert(shards(1).hi === BigInt("18446744073709551615")) // > Long.MaxValue
    assert(shards(1).hi.isValidLong === false)
  }

  test("range predicates tile the keyspace with no gaps or overlaps") {
    for (n <- Seq(1, 3, 7, 16)) {
      val preds = Sharded.rangePredicates("k", BigInt(0), BigInt("18446744073709551615"), n)
      assert(preds.length === n)
      val bs = preds.map(bounds)
      assert(bs.head._1 === BigInt(0))
      assert(bs.last._2 === BigInt("18446744073709551615"))
      bs.sliding(2).foreach {
        case Array((_, h1), (l2, _)) => assert(l2 === h1 + 1)
        case _ =>
      }
    }
  }

  test("uneven spans distribute the remainder without losing keys") {
    val preds = Sharded.rangePredicates("k", BigInt(0), BigInt(9), 4) // 10 keys / 4
    val bs = preds.map(bounds)
    assert(bs.map { case (l, h) => h - l + 1 }.sum === BigInt(10))
    assert(bs.toSeq === Seq(
      (BigInt(0), BigInt(2)), (BigInt(3), BigInt(5)),
      (BigInt(6), BigInt(7)), (BigInt(8), BigInt(9))))
  }
}
