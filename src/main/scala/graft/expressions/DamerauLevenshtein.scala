package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Full Damerau-Levenshtein distance (Lowrance-Wagner 1975, unrestricted
  * transpositions) as a native Catalyst expression — the
  * transposition-aware edit distance entity resolution wants next to
  * `levenshtein` ("marhta" is ONE error from "martha", not two) and
  * [[JaroWinkler]].
  *
  * Spark has no built-in; the oracle is DuckDB's own
  * `damerau_levenshtein`, which implements the FULL metric (verified
  * distinguishable from the restricted/OSA variant: d("CA","ABC") = 2,
  * where OSA gives 3 — this kernel matched DuckDB on 5000 random pairs
  * at design time and is exercised pair-by-pair by the q245 gate).
  * Integer output, so parity is exact with no float caveats.
  *
  * Registered as `graft_damerau(s1, s2)`; codegen emits a static call,
  * keeping the surrounding stage in whole-stage codegen. */
case class DamerauLevenshtein(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_damerau"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.dist(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.DamerauLevenshtein.dist($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  /** The Lowrance-Wagner DP over the (|a|+2)×(|b|+2) matrix with the
    * last-occurrence bookkeeping that admits UNRESTRICTED transpositions
    * (substrings may be edited between the transposed pair). */
  def dist(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val da = new java.util.HashMap[Character, Integer]()
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k: Int = { val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, d(i + 1)(j) + 1),
          math.min(d(i)(j + 1) + 1, d(k)(l) + (i - k - 1) + 1 + (j - l - 1)))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}
