package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  test("NFC composes decomposed diacritics to the precomposed codepoint") {
    val decomposed = "échec résumé" // e + combining acute ×3
    val got = Seq(decomposed).toDF("s")
      .select(expr("graft_normalize(s, 'NFC')")).as[String].head()
    assert(got == "\u00e9chec r\u00e9sum\u00e9")
    assert(got.length == decomposed.length - 3)
  }

  test("all four forms match java.text.Normalizer on mixed content") {
    val samples = Seq(
      "plain ascii stays",
      "é à ĩ ô ú", // decomposed vowels
      "\ufb01ne \uff10\uff11\uff12", // fi ligature + fullwidth digits
      "\u00e9 \u00e0 \u0129 \u00f4 \u00fa", // already precomposed
      "")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = samples.toDF("s")
        .select(expr(s"graft_normalize(s, '$form')")).as[String].collect()
      val want = samples.map(s =>
        Normalizer.normalize(s, Normalizer.Form.valueOf(form)))
      assert(got.toSeq == want, s"form $form")
    }
  }

  test("NFKC folds compatibility characters (ligature, fullwidth) — NFC does not") {
    val s = Seq("\ufb01le \uff13").toDF("s")
    assert(s.select(expr("graft_normalize(s, 'NFKC')")).as[String].head() == "file 3")
    assert(s.select(expr("graft_normalize(s, 'NFC')")).as[String].head() == "\ufb01le \uff13")
  }

  test("null in, null out; invalid form rejected at plan time") {
    val r = spark.sql("SELECT graft_normalize(CAST(NULL AS STRING), 'NFC')")
      .collect().head
    assert(r.isNullAt(0))
    val e = intercept[Exception](
      spark.sql("SELECT graft_normalize('x', 'NFX')").collect())
    assert(e.getMessage.contains("NFX") ||
      Option(e.getCause).exists(_.getMessage.contains("NFX")))
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_normalize('x', lower('NFC') || 'y')").collect())
    assert(e2 != null) // non-literal / non-form second arg is a plan error
  }

  test("expression stays in whole-stage codegen (no interpreted fallback)") {
    // CODEGEN_FACTORY_MODE=CODEGEN_ONLY makes a janino failure throw
    // instead of silently falling back to interpreted eval
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = spark.range(100)
        .select(expr("graft_normalize(concat('e', '\u0301', CAST(id AS STRING)), 'NFC')"))
        .as[String].collect()
      assert(got(7) == "\u00e97")
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
