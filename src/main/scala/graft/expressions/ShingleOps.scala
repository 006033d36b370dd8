package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the shared shingle → minhash → LSH text-dedup chain.
  *
  * The column compositions they replace (`transform`/`aggregate`/`slice`
  * higher-order lambdas around md5/conv/concat_ws — TextOps.scala) are
  * CodegenFallback territory: Catalyst evaluates the lambda's expression
  * TREE per array element, through interpreted `BinaryArithmetic.eval`/
  * `ConcatWs.eval` nodes, boxing every intermediate and allocating a
  * `GenericArrayData` per `slice`. A 15 ms stack sampler over the full
  * bench session shows those frames (plus the Reference Handler churning
  * behind the allocation storm) dominating every shingle-family query, and
  * the round-14 watchdog caught the same interpreted frames crawling at
  * 3-20x when late-session JIT profile pollution hits them — the roving
  * slow-rep phenomenon the round-13 verdict could not attribute. One
  * compiled Scala loop per ROW (not per element) replaces each chain;
  * whole-stage codegen calls straight into it (guide §4: eliminate
  * non-codegen expressions in the hot path).
  *
  * EXACT-equivalence contract (each kernel's scaladoc states the column
  * form it mirrors; ShingleOpsSpec fuzzes them against the originals, and
  * the 363-query oracle gate hash-checks every consumer):
  *  - md5 here is java.security MD5 over UTF-8 bytes, hex-lowercased —
  *    byte-identical to Spark's `md5` (commons-codec is the same digest);
  *  - `conv(substring(md5(s),1,8),16,10)` = the digest's first 4 bytes as
  *    a big-endian unsigned int — reproduced arithmetically;
  *  - concat_ws null-skipping, array_distinct first-occurrence order,
  *    array_min null-skipping, element_at out-of-range-as-null and the
  *    `size(NULL) = -1` guard branch are all preserved case by case.
  */
object ShingleOps {
  val P: Long = 2147483647L // Mersenne 2^31-1, TextOps.MinhashP

  /** MinHash permutation coefficients (seed 7) — the ONE definition;
    * TextOps re-exports these and the SQL oracle mirrors embed them as
    * literals. */
  val (hashA, hashB): (IndexedSeq[Long], IndexedSeq[Long]) = {
    val rnd = new scala.util.Random(7)
    (IndexedSeq.fill(32)(1L + rnd.nextLong(P - 1)),
      IndexedSeq.fill(32)(rnd.nextLong(P)))
  }
  private val hashAArr = hashA.toArray
  private val hashBArr = hashB.toArray

  /** Shared empty result for the `size(w) < n` guard branches. */
  val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  private val SPACE = UTF8String.fromString(" ")
  private val mdLocal = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))
  private val HEX = "0123456789abcdef".getBytes

  private def md5hex(bytes: Array[Byte]): UTF8String = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** conv(substring(md5(s),1,8),16,10) % P: first 4 digest bytes as a
    * big-endian unsigned 32-bit value, mod the Mersenne prime. */
  private def md5Head8ModP(s: UTF8String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % P
  }

  /** Mirror of `array_distinct(when(size(w) >= n, transform(sequence(0,
    * size(w)-n), i -> concat_ws(" ", slice(w, i+1, n)))).otherwise(array()))`
    * — null or shorter-than-n input takes the otherwise branch (empty
    * array, because size(NULL) = -1), concat_ws skips null elements, and
    * distinct keeps first-occurrence order under binary string equality. */
  def shingles(w: ArrayData, n: Int): ArrayData = {
    val len = w.numElements()
    if (len < n) return EMPTY
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        parts(j) = if (w.isNullAt(i + j)) null else w.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(SPACE, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]).asInstanceOf[Array[Any]])
  }

  /** Mirror of `transform(sh, s -> conv(substring(md5(s),1,8),16,10) % P)`
    * (cast to long) — null elements stay null. */
  def shingleHashes(sh: ArrayData): ArrayData = {
    val len = sh.numElements()
    val out = new Array[Any](len)
    var i = 0
    while (i < len) {
      if (!sh.isNullAt(i))
        out(i) = java.lang.Long.valueOf(md5Head8ModP(sh.getUTF8String(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Mirror of `array((0 until k).map(i -> array_min(transform(hs, h ->
    * (h*a_i + b_i) % P))))` — array_min skips null elements and returns
    * null on an empty/all-null array; a null INPUT array yields k nulls
    * (transform(NULL) = NULL, array_min(NULL) = NULL, outer array() still
    * built). Callers pass hs == null for that branch. */
  def minhashSig(hs: ArrayData, k: Int): ArrayData = {
    val out = new Array[Any](k)
    if (hs != null) {
      val len = hs.numElements()
      val mins = Array.fill(k)(Long.MaxValue)
      var any = false
      var i = 0
      while (i < len) {
        if (!hs.isNullAt(i)) {
          any = true
          val h = hs.getLong(i)
          var j = 0
          while (j < k) {
            val v = (h * hashAArr(j) + hashBArr(j)) % P
            if (v < mins(j)) mins(j) = v
            j += 1
          }
        }
        i += 1
      }
      if (any) {
        var j = 0
        while (j < k) { out(j) = java.lang.Long.valueOf(mins(j)); j += 1 }
      }
    }
    new GenericArrayData(out)
  }

  /** Mirror of `array((0 until bands).map(b -> struct(b as band,
    * md5(concat_ws(",", element_at(sig, b*rows+1) .. element_at(sig,
    * b*rows+rows))) as bkey)))` — element values are rendered as decimal
    * longs, nulls (null element or out-of-range index) are skipped by
    * concat_ws, the digest is over the joined UTF-8 bytes. */
  def lshBands(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(20 * rows)
    val n = sig.numElements()
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var first = true
      var r = 0
      while (r < rows) {
        val idx = b * rows + r
        if (idx < n && !sig.isNullAt(idx)) {
          if (!first) sb.append(',')
          sb.append(sig.getLong(idx))
          first = false
        }
        r += 1
      }
      val bkey = md5hex(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(b) = InternalRow(b, bkey)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Mirror of `transform(emb, x -> round(cast(x as double) * 1e7) cast
    * long)` under the session's ANSI default: widen, scale, HALF_UP round
    * (NaN/Infinity pass through the round, as Spark's RoundBase does),
    * then the ANSI double→long cast — which THROWS on NaN/Infinity/
    * overflow exactly like the composition it replaces (same
    * floor/ceiling range check as Spark's Cast). Null elements stay
    * null. */
  def quantize(emb: ArrayData, fromFloat: Boolean): ArrayData = {
    val len = emb.numElements()
    val out = new Array[Any](len)
    var i = 0
    while (i < len) {
      if (!emb.isNullAt(i)) {
        val d = (if (fromFloat) emb.getFloat(i).toDouble else emb.getDouble(i)) * 1e7
        val r =
          if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
          else java.math.BigDecimal.valueOf(d)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        if (!(math.floor(r) <= Long.MaxValue && math.ceil(r) >= Long.MinValue))
          throw new ArithmeticException(
            s"graft_quantize: value $r out of long range (ANSI cast overflow)")
        out(i) = java.lang.Long.valueOf(r.toLong)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-document character statistics in ONE row pass: struct(n_chars,
    * n_distinct_chars, clogc = Σ c·ln c over per-character counts c).
    * Replaces charEntropy's explode-every-character + two-level
    * aggregation — the per-char rows existed only to be counted back
    * down, and their exchange shuffled |text| rows per document (guide
    * §2.4: remove the shuffle outright). Characters are CODE POINTS,
    * exactly like `substr(i, 1)`/`length` on UTF8String; the Σ c·ln c
    * float sum is order-arbitrary in the aggregation it replaces (shuffle
    * order) and consumers round to 5 dp, which absorbs summation-order
    * noise in either form. */
  def charStats(t: UTF8String): InternalRow = {
    val bytes = t.getBytes
    val counts = new java.util.HashMap[Long, Long]()
    var i = 0
    var nChars = 0L
    while (i < bytes.length) {
      val b = bytes(i)
      val w =
        if ((b & 0x80) == 0) 1
        else if ((b & 0xe0) == 0xc0) 2
        else if ((b & 0xf0) == 0xe0) 3
        else if ((b & 0xf8) == 0xf0) 4
        else 1 // invalid lead byte: count it alone, like substring would slice
      var key = 0L
      var j = 0
      while (j < w && i + j < bytes.length) {
        key = (key << 8) | (bytes(i + j) & 0xffL)
        j += 1
      }
      counts.merge(key, 1L, java.lang.Long.sum(_, _))
      nChars += 1
      i += w
    }
    var clogc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      clogc += c * math.log(c)
    }
    InternalRow(nChars, counts.size.toLong, clogc)
  }

  /** Mirror of winnowGramHashes: `when(size(w) >= n, transform(sequence(0,
    * size(w)-n), i -> conv(substring(md5(concat_ws(" ", slice(w, i+1,
    * n))),1,8),16,10) cast long)).otherwise(array())` — positional gram
    * hashes WITHOUT the MinHash modulus (raw 32-bit value). */
  def winnowHashes(w: ArrayData, n: Int): ArrayData = {
    val len = w.numElements()
    if (len < n) return EMPTY
    val out = new Array[Any](len - n + 1)
    val parts = new Array[UTF8String](n)
    val md = mdLocal.get()
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        parts(j) = if (w.isNullAt(i + j)) null else w.getUTF8String(i + j)
        j += 1
      }
      md.reset()
      val d = md.digest(UTF8String.concatWs(SPACE, parts: _*).getBytes)
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      out(i) = java.lang.Long.valueOf(v)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Mirror of winnowMins: `when(size(hs) >= win,
    * array_distinct(transform(sequence(0, size(hs)-win), i ->
    * array_min(slice(hs, i+1, win))))).otherwise(array())` — distinct
    * window minima in first-occurrence order (inputs are the non-null
    * winnowHashes values; a null element would make its windows' minima
    * null-skipped by array_min, preserved here for safety). */
  def winnowMins(hs: ArrayData, win: Int): ArrayData = {
    val len = hs.numElements()
    if (len < win) return EMPTY
    val seen = new java.util.LinkedHashSet[Any]()
    var i = 0
    while (i <= len - win) {
      var min = Long.MaxValue
      var any = false
      var j = 0
      while (j < win) {
        if (!hs.isNullAt(i + j)) {
          val v = hs.getLong(i + j)
          if (!any || v < min) { min = v; any = true }
        }
        j += 1
      }
      seen.add(if (any) java.lang.Long.valueOf(min) else null)
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]).asInstanceOf[Array[Any]])
  }

  /** Mirror of dupSpanMask's positional gram pass: `transform(sequence(0,
    * size(w)-n), i -> md5(concat_ws(" ", slice(w, i+1, n))))` — one
    * NON-distinct md5 hex string per position, in position order (the
    * caller posexplodes, so array order IS the position column). Callers
    * filter `size(w) >= n` first — the composed form is undefined below
    * that (a descending `sequence` feeds `slice` a 0 start, which throws),
    * so the kernel just guards with the empty array. */
  def gramHashes(w: ArrayData, n: Int): ArrayData = {
    val len = w.numElements()
    if (len < n) return EMPTY
    val out = new Array[Any](len - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        parts(j) = if (w.isNullAt(i + j)) null else w.getUTF8String(i + j)
        j += 1
      }
      out(i) = md5hex(UTF8String.concatWs(SPACE, parts: _*).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_char_stats(t)`: per-document code-point statistics —
  * struct(n_chars, n_distinct_chars, clogc). */
case class CharStats(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct_chars", LongType, nullable = false),
    StructField("clogc", DoubleType, nullable = false)))
  override def prettyName: String = "graft_char_stats"

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.charStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleOps.charStats($c)")

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}

/** `graft_winnow_hashes(w, n)`: positional 32-bit gram hashes (winnowing
  * form, no modulus) — never null (empty array below n words). */
case class WinnowHashes(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"graft_winnow_hashes: n must be >= 1, got $n")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_winnow_hashes"

  override def eval(input: InternalRow): Any = {
    val w = child.eval(input)
    if (w == null) ShingleOps.EMPTY
    else ShingleOps.winnowHashes(w.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val nStr = n.toString
    val code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${c.isNull} ?
          graft.expressions.ShingleOps.EMPTY() :
          graft.expressions.ShingleOps.winnowHashes(${c.value}, $nStr);
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
    copy(child = newChild)
}

/** `graft_winnow_mins(hs, win)`: distinct sliding-window minima — never
  * null (empty array below win hashes). */
case class WinnowMins(child: Expression, win: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(win >= 1, s"graft_winnow_mins: win must be >= 1, got $win")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_winnow_mins"

  override def eval(input: InternalRow): Any = {
    val hs = child.eval(input)
    if (hs == null) ShingleOps.EMPTY
    else ShingleOps.winnowMins(hs.asInstanceOf[ArrayData], win)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val wStr = win.toString
    val code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${c.isNull} ?
          graft.expressions.ShingleOps.EMPTY() :
          graft.expressions.ShingleOps.winnowMins(${c.value}, $wStr);
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

/** `graft_quantize(emb)`: round(x·1e7) per float/double component, as
  * longs — the embedding quantizer every ANN/k-means operator scans
  * through. Mirrors `transform(emb, x -> round(cast(x as double) * 1e7)
  * cast long)` exactly: Spark's `round` on DoubleType is
  * BigDecimal.valueOf(v).setScale(0, HALF_UP) with NaN/Infinity passed
  * through, and the long cast is the plain toLong truncation (NaN -> 0,
  * Infinity saturates). QuantizeSpec fuzzes the equivalence. */
case class Quantize(child: Expression)
  extends UnaryExpression {
  // lazy: children are unresolved at builder time, dataType would throw
  private lazy val fromFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_quantize needs array<float> or array<double>, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_quantize"

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.quantize(input.asInstanceOf[ArrayData], fromFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleOps.quantize($c, $fromFloat)")

  override protected def withNewChildInternal(newChild: Expression): Quantize =
    copy(child = newChild)
}

/** `graft_shingles(w, n)`: distinct word n-grams of a words array — never
  * null (empty array for null/short input, like the `when` guard it
  * replaces). */
case class Shingles(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"graft_shingles: n must be >= 1, got $n")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingles"

  override def eval(input: InternalRow): Any = {
    val w = child.eval(input)
    if (w == null) ShingleOps.EMPTY
    else ShingleOps.shingles(w.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val nStr = n.toString
    val code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${c.isNull} ?
          graft.expressions.ShingleOps.EMPTY() :
          graft.expressions.ShingleOps.shingles(${c.value}, $nStr);
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** `graft_shingle_hashes(sh)`: 31-bit md5-based hash per shingle. */
case class ShingleHashes(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.shingleHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleOps.shingleHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `graft_minhash_sig(hs, k)`: k-permutation MinHash signature — never
  * null (k null elements when the input is null/empty, like the
  * array-of-array_min form it replaces). */
case class MinhashSig(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && k <= 32, s"graft_minhash_sig: k must be in 1..32, got $k")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_sig"

  override def eval(input: InternalRow): Any = {
    val hs = child.eval(input)
    ShingleOps.minhashSig(
      if (hs == null) null else hs.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val kStr = k.toString
    val code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.expressions.ShingleOps.minhashSig(${c.isNull} ? null : ${c.value}, $kStr);
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** `graft_lsh_bands(sig, bands, rows)`: banded signature fold —
  * array<struct<band:int, bkey:string>>. */
case class LshBands(child: Expression, bands: Int, rows: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(bands >= 1 && rows >= 1, s"graft_lsh_bands: bad bands=$bands rows=$rows")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bkey", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_lsh_bands"

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.lshBands(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleOps.lshBands($c, $bands, $rows)")

  override protected def withNewChildInternal(newChild: Expression): LshBands =
    copy(child = newChild)
}

/** `graft_gram_hashes(w, n)`: positional (non-distinct) n-gram md5 hex
  * strings, one per window position. */
case class GramHashes(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"graft_gram_hashes: n must be >= 1, got $n")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.gramHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleOps.gramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}
