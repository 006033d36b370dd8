package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC / NFD / NFKC / NFKD) as a native Catalyst
  * expression — the canonicalization step every web-scale text pipeline
  * needs before dedup or tokenization: the same visible text arrives in
  * both precomposed (U+00E9 `é`) and decomposed (`e` + U+0301) forms, and
  * without normalization exact dedup, shingling, and vocabulary counting
  * all treat them as different strings.
  *
  * Why a native expression: Spark has no built-in Unicode-normalize
  * function, and a Scala UDF would break whole-stage codegen and pay
  * serialization per row. This compiles to a direct
  * `java.text.Normalizer` call inside the generated code — the stage
  * stays in codegen, and the ICU-equivalent normalization tables ship
  * with the JDK (public, standard `java.text` API).
  *
  * The `form` is a plan-time constant (validated at construction), so
  * codegen embeds the enum reference directly — no per-row dispatch.
  *
  * Registered as `graft_normalize(str, 'NFC')` via
  * [[graft.GraftExtensions]]. Oracle parity: DuckDB's `nfc_normalize`
  * implements the same Unicode NFC, which is what the q222 gate
  * hash-checks.
  */
case class NormalizeText(child: Expression, formName: String)
  extends UnaryExpression with ExpectsInputTypes {

  require(NormalizeText.Forms.contains(formName),
    s"graft_normalize form must be one of ${NormalizeText.Forms.mkString(", ")}, got '$formName'")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  @transient private lazy val form = java.text.Normalizer.Form.valueOf(formName)

  override protected def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    // isNormalized is a cheap scan that avoids the allocating normalize
    // call on the (dominant, mostly-ASCII) already-normal case
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      s"""
         |java.lang.String $str = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($str, java.text.Normalizer.Form.$formName)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($str, java.text.Normalizer.Form.$formName));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}
