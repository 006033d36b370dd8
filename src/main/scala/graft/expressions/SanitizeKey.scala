package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `sanitize_key` as ONE native codegen'd byte walk — the category-key
  * normalizer (reference precompute_poi_reach.py:22-30: lower →
  * junk-runs→`_` → collapse `_+` → strip edge `_` → default "cat" →
  * truncate 60). The composed column form (lower + regexp_replace +
  * trim) is already a single regex pass, but the regex engine per row
  * was the measured worst scaler in the 10× table (q16 7.4×: pure CPU
  * saturation); this walk does the same work with no regex, no
  * intermediate strings, one output buffer.
  *
  * Exact-equivalence argument (the q16 oracle still replays the spec's
  * three-pass regex form in DuckDB, so parity is hash-checked, and
  * SanitizeKeySpec fuzzes it against the old column composition):
  *  - lowercase: UTF8String.toLowerCase — the SAME call Spark's `lower`
  *    makes, so byte-identical;
  *  - the kept class [a-z0-9.-] is pure ASCII, so scanning BYTES equals
  *    scanning characters: every byte of a multi-byte UTF-8 char is
  *    ≥ 0x80 → junk, and a junk run of bytes collapses exactly like a
  *    junk run of chars;
  *  - a pending `_` is emitted only when a kept byte follows AND output
  *    is nonempty ⇒ junk runs at either edge vanish (= trim('_')) and
  *    inner runs yield one `_` (= the collapsed replace);
  *  - survivors are all ASCII, so the 60-CHAR truncate is the 60-byte
  *    truncate.
  * NULL input: the reference's Python returns "cat" for None, but this
  * expression NULL-propagates (nullSafeEval) — an INTENTIONAL divergence
  * shared by the composed column form and the DuckDB oracle mirror, so
  * both engines agree; callers wanting spec fidelity on NULL should
  * coalesce to 'cat' themselves.
  * Registered as `graft_sanitize_key`. */
case class SanitizeKey(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_sanitize_key"

  override protected def nullSafeEval(input: Any): Any =
    SanitizeKey.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SanitizeKey.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SanitizeKey =
    copy(child = newChild)
}

object SanitizeKey {
  private val Cat = UTF8String.fromString("cat")

  def compute(in: UTF8String): UTF8String = {
    val b = in.toLowerCase.getBytes // same lowercase as Spark's lower()
    val out = new Array[Byte](math.min(b.length, 60))
    var n = 0
    var pending = false
    var i = 0
    while (i < b.length && n < 60) {
      val c = b(i)
      val kept = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        c == '.' || c == '-'
      if (kept) {
        if (pending && n > 0) {
          out(n) = '_'
          n += 1
          if (n >= 60) { pending = false; i = b.length }
        }
        pending = false
        if (n < 60) { out(n) = c; n += 1 }
      } else pending = true
      i += 1
    }
    if (n == 0) Cat
    else UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }
}
