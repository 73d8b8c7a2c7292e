package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom imperative aggregates for the sketch operators: one
  * array-typed buffer updated in a tight JVM loop per input row,
  * replacing `bits`/`k` parallel SQL aggregate columns. Bit-identical
  * to the column formulations (DedupSpec + the DuckDB oracle pin it);
  * ~an order of magnitude fewer aggregate-update calls.
  */
object NativeAggs {

  /** SimHash component sums: buffer[b] += 2*bit_b(h)−1 per input hash;
    * eval assembles the signature long (bit b set iff buffer[b] >= 0).
    */
  case class SimHashAgg(
      child: Expression,
      bits: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    // bits > 64 would wrap the 1L << b shift in eval, silently
    // corrupting low signature bits
    require(bits >= 1 && bits <= 64, s"SimHashAgg: bits must be in [1, 64], got $bits")

    override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        var b = 0
        while (b < bits) { buf(b) += ((h >> b) & 1L) * 2 - 1; b += 1 }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < bits) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = {
      var sig = 0L
      var b = 0
      while (b < bits) { if (buf(b) >= 0) sig |= 1L << b; b += 1 }
      sig
    }

    override def serialize(buf: Array[Long]): Array[Byte] = longsToBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] = bytesToLongs(bytes)

    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): SimHashAgg =
      copy(child = newChildren.head)
  }

  /** All k MinHash permutation minima in one buffer:
    * buffer[j] = min over inputs of (a_j·(sh mod P) + b_j) mod P with
    * the same deterministic coefficients as [[Hashing.minhashPerm]].
    */
  case class MinHashAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    require(k >= 1, s"MinHashAgg: k must be >= 1, got $k")

    private val P = Hashing.P
    private val as: Array[Long] = Array.tabulate(k)(j => ((j + 1) * 961748941L) % P)
    private val bs: Array[Long] = Array.tabulate(k)(j => ((j + 1) * 982451653L) % P)

    override def createAggregationBuffer(): Array[Long] =
      Array.fill(k)(Long.MaxValue)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long] % P
        var j = 0
        while (j < k) {
          val p = (as(j) * h + bs(j)) % P
          if (p < buf(j)) buf(j) = p
          j += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var j = 0
      while (j < k) { if (b2(j) < b1(j)) b1(j) = b2(j); j += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

    override def serialize(buf: Array[Long]): Array[Byte] = longsToBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] = bytesToLongs(bytes)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): MinHashAgg =
      copy(child = newChildren.head)
  }

  /** Bloom-filter bitset over pre-hashed 64-bit keys: `mBits` bits as
    * an `Array[Long]` buffer, `k` probe positions per key by double
    * hashing (`h1 + i·h2 mod m` — Kirsch–Mitzenmacher, so one 64-bit
    * hash feeds all k probes). The bitset never leaves the engine
    * (probe positions are checked by [[BloomJoin.mightContain]] with
    * the same closed form), so the fast xxhash64 tier is fine here —
    * no cross-engine portability constraint.
    */
  case class BloomAgg(
      child: Expression,
      mBits: Int,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    require(mBits >= 64 && mBits % 64 == 0,
      s"BloomAgg: mBits must be a positive multiple of 64, got $mBits")
    require(k >= 1 && k <= 16, s"BloomAgg: k must be in [1, 16], got $k")

    override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        val h1 = java.lang.Math.floorMod(h, mBits.toLong)
        val h2 = 1L + java.lang.Math.floorMod(h >>> 33, (mBits - 1).toLong)
        var i = 0
        while (i < k) {
          val pos = ((h1 + i * h2) % mBits).toInt
          buf(pos >> 6) |= 1L << (pos & 63)
          i += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) |= b2(i); i += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

    override def serialize(buf: Array[Long]): Array[Byte] = longsToBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] = bytesToLongs(bytes)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): BloomAgg =
      copy(child = newChildren.head)
  }

  /** k-minimum-values distinct sketch (Bar-Yossef et al. 2002): the k
    * smallest DISTINCT hash values seen, as a sorted ascending array.
    * Mergeable by union-then-truncate; O(k) state per group regardless
    * of cardinality — the bottom-k sample doubles as a deterministic
    * per-group element sample. The estimator `(k−1)·M div m_k` (M =
    * hash-space size, m_k = k-th minimum) lives in the caller so the
    * sketch stays estimator-agnostic. Feed it PORTABLE hashes when the
    * result must replicate in an external engine — the buffer content
    * is then bit-exact reproducible as `DISTINCT hash ORDER BY hash
    * LIMIT k`.
    */
  case class KmvAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

    require(k >= 2, s"KmvAgg: k must be >= 2, got $k")

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    override def update(
        buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        // admit only below the current k-th minimum (or while filling)
        if (buf.size < k) buf.add(h)
        else if (h < buf.last) { if (buf.add(h)) buf.pollLast() }
      }
      buf
    }

    override def merge(
        b1: java.util.TreeSet[java.lang.Long],
        b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = b2.iterator()
      while (it.hasNext) {
        val h = it.next()
        if (b1.size < k) b1.add(h)
        else if (h < b1.last) { if (b1.add(h)) b1.pollLast() }
      }
      b1
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val out = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val a = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { a(i) = it.next(); i += 1 }
      longsToBytes(a)
    }
    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val s = new java.util.TreeSet[java.lang.Long]()
      bytesToLongs(bytes).foreach(s.add(_))
      s
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): KmvAgg =
      copy(child = newChildren.head)
  }

  private def longsToBytes(a: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(a.length * 8)
    a.foreach(bb.putLong)
    bb.array()
  }

  private def bytesToLongs(b: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(b)
    Array.fill(b.length / 8)(bb.getLong())
  }

  /** Column faces. */
  def simhashAgg(c: Column, bits: Int): Column =
    Bridge.column(SimHashAgg(Bridge.expression(c), bits).toAggregateExpression())
  def minhashAgg(c: Column, k: Int): Column =
    Bridge.column(MinHashAgg(Bridge.expression(c), k).toAggregateExpression())
  def bloomAgg(c: Column, mBits: Int, k: Int): Column =
    Bridge.column(BloomAgg(Bridge.expression(c), mBits, k).toAggregateExpression())
  def kmvAgg(c: Column, k: Int): Column =
    Bridge.column(KmvAgg(Bridge.expression(c), k).toAggregateExpression())
}
