package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GeoFunctions

class SanitizeKeySpec extends SparkSpec {
  import spark.implicits._

  private def both(ss: Seq[String]): Seq[(String, String, String)] = {
    val df = ss.toDF("s")
    df.select(col("s"), GeoFunctions.sanitizeKey(col("s")).as("native"),
        GeoFunctions.sanitizeKeyComposed(col("s")).as("composed"))
      .as[(String, String, String)].collect().toSeq
  }

  test("hand cases: junk runs, edges, default, truncate") {
    val got = both(Seq(
      "Park & Ride", "  __a__b__  ", "!!!", "", "a", "A.B-c_9",
      "a" * 100, ("x!" * 50), "über café", "日本語", "-.-", "_a_"))
      .map(r => r._1 -> r._2).toMap
    assert(got("Park & Ride") == "park_ride")
    assert(got("  __a__b__  ") == "a_b")
    assert(got("!!!") == "cat")
    assert(got("") == "cat")
    assert(got("A.B-c_9") == "a.b-c_9")
    assert(got("a" * 100) == "a" * 60)
    assert(got("über café") == "ber_caf") // non-ASCII is junk
    assert(got("日本語") == "cat")
    assert(got("-.-") == "-.-")
    assert(got("_a_") == "a")
  }

  test("fuzz: native == composed regex form on 2000 adversarial strings") {
    val rnd = new scala.util.Random(99)
    val alphabet = "aZ09._-!# éあ\\'\"\t" + "ßİ"
    val ss = (0 until 2000).map { _ =>
      val n = rnd.nextInt(80)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } :+ "" :+ ("_!" * 40) :+ ("a_" * 40)
    val rows = both(ss)
    val bad = rows.filter(r => r._2 != r._3)
    assert(bad.isEmpty, s"native != composed on: ${bad.take(5)}")
  }

  test("codegen path evaluates (no interpreted fallback needed)") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = Seq("Park & Ride", "x").toDF("s")
        .select(GeoFunctions.sanitizeKey(col("s"))).distinct().count()
      assert(n == 2)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
