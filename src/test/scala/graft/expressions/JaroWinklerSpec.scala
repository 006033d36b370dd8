package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  test("classic published pairs match DuckDB's jaro_winkler_similarity bit-for-bit") {
    // expected doubles taken verbatim from DuckDB (the q223 oracle)
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),  // one transposition + boost
      ("dwayne", "duane", 0.8400000000000001),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("abc", "abc", 1.0),
      ("", "x", 0.0),
      ("", "", 0.0),                              // DuckDB: empty -> 0, even both
      ("a", "a", 1.0),
      ("crate", "trace", 0.7333333333333334),     // jaro <= 0.7 boundary: no boost
      ("abcdef", "badcfe", 0.8333333333333334))   // three transpositions
    val got = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .select(expr("graft_jaro_winkler(a, b)")).as[Double].collect()
    cases.map(_._3).zip(got).zipWithIndex.foreach { case ((want, g), i) =>
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(want), s"case $i: $g != $want")
    }
  }

  test("symmetry and bounds on random strings") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val ab = JaroWinkler.sim(a, b)
      assert(ab == JaroWinkler.sim(b, a))
      assert(ab >= 0.0 && ab <= 1.0)
      if (a.nonEmpty) assert(JaroWinkler.sim(a, a) == 1.0)
    }
  }

  test("null in, null out; stays in whole-stage codegen") {
    val r = spark.sql("SELECT graft_jaro_winkler(NULL, 'x')").collect().head
    assert(r.isNullAt(0))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = spark.range(10)
        .select(expr("graft_jaro_winkler('martha', concat('marhta', CAST(id AS STRING)))"))
        .as[Double].collect()
      assert(got.length == 10 && got.forall(v => v > 0.8 && v < 1.0))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
