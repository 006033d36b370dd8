package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DamerauLevenshteinSpec extends SparkSpec {
  import spark.implicits._

  test("full (unrestricted) transposition semantics — the OSA-distinguishing cases") {
    val cases = Seq(
      ("CA", "ABC", 2),      // full DL 2; restricted/OSA would say 3
      ("ab", "ba", 1),       // plain transposition
      ("martha", "marhta", 1),
      ("abc", "abc", 0),
      ("", "xyz", 3), ("xyz", "", 3), ("", "", 0),
      ("kitten", "sitting", 3),
      ("abcdef", "badcfe", 3)) // three adjacent transpositions
    val got = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .selectExpr("graft_damerau(a, b)").as[Int].collect()
    cases.map(_._3).zip(got).zipWithIndex.foreach { case ((w, g), i) =>
      assert(g == w, s"case $i: got $g want $w")
    }
  }

  test("metric properties and levenshtein upper bound on random strings") {
    val rnd = new scala.util.Random(19)
    for (_ <- 1 to 400) {
      val a = (0 until rnd.nextInt(10)).map(_ => "abcd" (rnd.nextInt(4))).mkString
      val b = (0 until rnd.nextInt(10)).map(_ => "abcd" (rnd.nextInt(4))).mkString
      val d = DamerauLevenshtein.dist(a, b)
      assert(d == DamerauLevenshtein.dist(b, a), "symmetry")
      assert(d >= 0 && d <= math.max(a.length, b.length), "bounds")
      assert((d == 0) == (a == b), "identity")
      // DL never exceeds plain levenshtein (transpositions only help)
      val lev = {
        val m = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        m(a.length)(b.length)
      }
      assert(d <= lev, s"'$a' vs '$b': dl $d > lev $lev")
    }
  }

  test("null in, null out; stays in whole-stage codegen") {
    assert(spark.sql("SELECT graft_damerau(NULL, 'x')").collect().head.isNullAt(0))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = spark.range(20)
        .selectExpr("graft_damerau('martha', concat('marhta', CAST(id AS STRING)))")
        .as[Int].collect()
      assert(got.toSeq == (0 until 20).map(i => 1 + i.toString.length))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
