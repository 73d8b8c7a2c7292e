package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind the native expressions — tight JVM loops the
  * codegen emits single calls to. Shared by interpreted `eval` and
  * generated code so both paths are bit-identical by construction.
  */
object NativeKernels {
  final val P = 1000000007L

  /** Bit-identical twin of the HOF [[Hashing.portableHashHof]] chain
    * `aggregate(transform(sequence(1, greatest(len,1)), i =>
    * ascii(substr(s,i,1))), 7, (h,x) => (h*31+x) % P)`:
    * fold codepoints left-to-right; the empty string contributes one
    * zero step (ascii("") = 0), exactly like the HOF's greatest(len,1).
    */
  def portableHash(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) return (7L * 31) % P
    var h = 7L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Integer dot product of two long arrays (equal length expected —
    * truncates to the shorter, unlike zip_with's null padding, which
    * would null the whole sum; equal-dim inputs are the contract).
    */
  def dotQ(a: ArrayData, b: ArrayData): Long = {
    val n = Math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** Squared norm of a long array. */
  def normQ(a: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { val v = a.getLong(i); acc += v * v; i += 1 }
    acc
  }

  /** `floor(x*1e6 + 0.5)` per element, float input. */
  def quantizeF(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = Math.floor(a.getFloat(i).toDouble * 1000000.0 + 0.5).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `floor(x*1e6 + 0.5)` per element, double input. */
  def quantizeD(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = Math.floor(a.getDouble(i) * 1000000.0 + 0.5).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Java-regex `\s` membership (ASCII five + vertical tab) — the
    * whitespace class of `regexp_extract_all(text, '\\S+')`, which the
    * shingle kernels must tokenize identically to.
    */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def tokenBounds(str: String): Array[Int] = {
    // flat (start, end) pairs of maximal non-whitespace runs
    val bounds = new scala.collection.mutable.ArrayBuffer[Int](32)
    var i = 0
    while (i < str.length) {
      while (i < str.length && isWs(str.charAt(i))) i += 1
      if (i < str.length) {
        val s = i
        while (i < str.length && !isWs(str.charAt(i))) i += 1
        bounds += s += i
      }
    }
    bounds.toArray
  }

  /** All word-n-gram shingle hashes of a document in ONE pass —
    * bit-identical to `portableHash(concat_ws(" ", slice(tokens, i, n)))`
    * per gram, with no token array, gram string, or lambda-chain
    * materialization. Duplicates preserved (callers dedup after
    * explode).
    */
  def shingleHashesPortable(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val b = tokenBounds(str)
    val nTok = b.length / 2
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nTok - n + 1)
    var g = 0
    while (g <= nTok - n) {
      var h = 7L
      var j = 0
      while (j < n) {
        if (j > 0) h = (h * 31 + 32) % P // the joining space
        var ci = b(2 * (g + j))
        val ce = b(2 * (g + j) + 1)
        while (ci < ce) {
          val cp = str.codePointAt(ci)
          h = (h * 31 + cp) % P
          ci += Character.charCount(cp)
        }
        j += 1
      }
      out(g) = h
      g += 1
    }
    new GenericArrayData(out)
  }

  /** All k-token ROLLING polynomial window hashes in one O(chars)
    * pass — the suffix-array-replacement kernel for exact-substring
    * dedup at large k. Where [[shingleHashesPortable]] re-hashes every
    * gram's characters (O(chars × k) total — fine at n=3, a k× tax at
    * the Lee et al. k=50), this hashes each TOKEN once (`t_i =
    * portableHash(token)`, the `ph(tok)` DuckDB twin) and combines
    * windows arithmetically:
    *
    *   `wh_g = Σ_{j<k} t_{g+j} · 31^{k-1-j}  mod P`
    *   `wh_{g+1} = ((wh_g − t_g·31^{k-1}) · 31 + t_{g+k})  mod P`
    *
    * — a DuckDB-replicable formula (`list_reduce(th[g+1:g+k],
    * (a,b) -> (a*31+b) % P)`). All intermediates fit a Long:
    * `t·pow < P² ≈ 1.1e18`, `(h+P)·31 < 6.7e10`.
    */
  def rollingHashesPortable(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    val b = tokenBounds(str)
    val nTok = b.length / 2
    if (nTok < k) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      var h = 7L
      var ci = b(2 * i)
      val ce = b(2 * i + 1)
      while (ci < ce) {
        val cp = str.codePointAt(ci)
        h = (h * 31 + cp) % P
        ci += Character.charCount(cp)
      }
      th(i) = h
      i += 1
    }
    var pow = 1L
    i = 1
    while (i < k) { pow = pow * 31 % P; i += 1 }
    val out = new Array[Long](nTok - k + 1)
    var h = th(0)
    i = 1
    while (i < k) { h = (h * 31 + th(i)) % P; i += 1 }
    out(0) = h
    var g = 1
    while (g <= nTok - k) {
      h = ((h + P - th(g - 1) * pow % P) % P * 31 + th(g + k - 1)) % P
      out(g) = h
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Fast tier of [[rollingHashesPortable]]: xxhash64(seed 42) token
    * hashes combined in the mod-2⁶⁴ ring (natural Long overflow) with
    * an odd multiplier — full 64-bit window space, so corpus-scale
    * window counts stay collision-safe where the portable tier's
    * ~2³⁰ space is a fixture convention. Subtraction is exact in the
    * ring, so the rolling update loses nothing to overflow.
    */
  final val RollM = 1099511628211L // FNV-64 prime (odd)
  def rollingHashesXx(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    @inline def ws(x: Byte): Boolean =
      x == 0x20 || x == 0x09 || x == 0x0a || x == 0x0b || x == 0x0c || x == 0x0d
    val bounds = new scala.collection.mutable.ArrayBuffer[Int](32)
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && ws(bytes(i))) i += 1
      if (i < bytes.length) {
        val st = i
        while (i < bytes.length && !ws(bytes(i))) i += 1
        bounds += st += i
      }
    }
    val nTok = bounds.length / 2
    if (nTok < k) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](nTok)
    i = 0
    while (i < nTok) {
      val st = bounds(2 * i)
      th(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + st,
        bounds(2 * i + 1) - st, 42L)
      i += 1
    }
    var pow = 1L
    i = 1
    while (i < k) { pow *= RollM; i += 1 }
    val out = new Array[Long](nTok - k + 1)
    var h = th(0)
    i = 1
    while (i < k) { h = h * RollM + th(i); i += 1 }
    out(0) = h
    var g = 1
    while (g <= nTok - k) {
      h = (h - th(g - 1) * pow) * RollM + th(g + k - 1)
      out(g) = h
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Fast-tier twin: xxhash64(seed 42, same bytes as the joined gram
    * string) — byte-level tokenization is safe because every UTF-8
    * continuation byte is >= 0x80 and all `\s` members are ASCII.
    */
  def shingleHashesXx(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    @inline def ws(x: Byte): Boolean =
      x == 0x20 || x == 0x09 || x == 0x0a || x == 0x0b || x == 0x0c || x == 0x0d
    val bounds = new scala.collection.mutable.ArrayBuffer[Int](32)
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && ws(bytes(i))) i += 1
      if (i < bytes.length) {
        val st = i
        while (i < bytes.length && !ws(bytes(i))) i += 1
        bounds += st += i
      }
    }
    val nTok = bounds.length / 2
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    var scratch = new Array[Byte](64)
    val out = new Array[Long](nTok - n + 1)
    var g = 0
    while (g <= nTok - n) {
      var len = 0
      var j = 0
      while (j < n) {
        val st = bounds(2 * (g + j)); val en = bounds(2 * (g + j) + 1)
        val need = len + (en - st) + 1
        if (need > scratch.length) {
          val bigger = new Array[Byte](Integer.highestOneBit(need) * 2)
          System.arraycopy(scratch, 0, bigger, 0, len)
          scratch = bigger
        }
        if (j > 0) { scratch(len) = 0x20; len += 1 }
        System.arraycopy(bytes, st, scratch, len, en - st)
        len += en - st
        j += 1
      }
      out(g) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        scratch, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** Native, codegen'd twin of the portable polynomial string hash.
  * StringType → LongType; null-intolerant.
  */
case class PortableHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    NativeKernels.portableHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeKernels.portableHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PortableHashExpr =
    copy(child = newChild)
}

/** Exact integer dot product over `array<bigint>` columns. */
case class DotQExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeKernels.dotQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NativeKernels.dotQ($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotQExpr =
    copy(left = newLeft, right = newRight)
}

/** Squared norm over an `array<bigint>` column. */
case class NormQExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    NativeKernels.normQ(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeKernels.normQ($c)")
  override protected def withNewChildInternal(newChild: Expression): NormQExpr =
    copy(child = newChild)
}

/** One-pass word-n-gram shingle hashes: StringType → array<bigint>,
  * one element per gram (duplicates preserved). `portable` picks the
  * polynomial tier; otherwise xxhash64 (seed 42), both bit-identical
  * to hashing the `concat_ws(" ", slice(tokens, i, n))` gram strings.
  */
case class ShingleHashesExpr(child: Expression, n: Int, portable: Boolean)
  extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    if (portable) NativeKernels.shingleHashesPortable(input.asInstanceOf[UTF8String], n)
    else NativeKernels.shingleHashesXx(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (portable) "shingleHashesPortable" else "shingleHashesXx"
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeKernels.$fn($c, $n)")
  }
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** One-pass k-token rolling window hashes: StringType → array<bigint>,
  * one element per window offset (0-based). `portable` picks the
  * mod-P polynomial over `portableHash(token)` values (DuckDB-
  * replicable); otherwise the mod-2⁶⁴ ring over xxhash64 token hashes
  * (collision-safe at corpus scale).
  */
case class RollingHashesExpr(child: Expression, k: Int, portable: Boolean)
  extends UnaryExpression {
  require(k >= 2, s"rolling window needs k >= 2, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    if (portable) NativeKernels.rollingHashesPortable(input.asInstanceOf[UTF8String], k)
    else NativeKernels.rollingHashesXx(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (portable) "rollingHashesPortable" else "rollingHashesXx"
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeKernels.$fn($c, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): RollingHashesExpr =
    copy(child = newChild)
}

/** Per-element `floor(x*1e6 + 0.5)` quantization of a float/double
  * array into `array<bigint>`.
  */
case class QuantizeE6Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"quantizeE6: unsupported $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    if (isFloat) NativeKernels.quantizeF(input.asInstanceOf[ArrayData])
    else NativeKernels.quantizeD(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "quantizeF" else "quantizeD"
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeKernels.$fn($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): QuantizeE6Expr =
    copy(child = newChild)
}

/** Public Column-level face of the native expressions. */
object NativeOps {
  def portableHash(c: Column): Column = Bridge.column(PortableHashExpr(Bridge.expression(c)))
  def dotQ(a: Column, b: Column): Column =
    Bridge.column(DotQExpr(Bridge.expression(a), Bridge.expression(b)))
  def normQ(a: Column): Column = Bridge.column(NormQExpr(Bridge.expression(a)))
  def quantizeE6(a: Column): Column = Bridge.column(QuantizeE6Expr(Bridge.expression(a)))
  def shingleHashes(c: Column, n: Int, portable: Boolean): Column =
    Bridge.column(ShingleHashesExpr(Bridge.expression(c), n, portable))
  def rollingHashes(c: Column, k: Int, portable: Boolean): Column =
    Bridge.column(RollingHashesExpr(Bridge.expression(c), k, portable))

  /** Make every native kernel callable from `spark.sql(...)` text on an
    * EXISTING session (same table as [[graft.GraftExtensions]], which is
    * the build-time path). Idempotent per session.
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftExtensions.functions.foreach { case (ident, _, builder) =>
      Bridge.registerFunction(spark, ident.funcName, builder)
    }
}
