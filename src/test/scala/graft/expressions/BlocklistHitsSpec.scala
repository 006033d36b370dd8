package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BlocklistHitsSpec extends SparkSpec {
  import spark.implicits._

  private val terms = "array('scan slow', 'slow', 'low', 'par', 'spark', 'he lin')"

  test("overlapping terms, nested terms, cross-word matches — all reported") {
    val got = Seq("the line scan slows sparks").toDF("s")
      .select(expr(s"graft_blocklist_hits(s, $terms)")).as[Seq[String]].head()
    // 'scan slow' contains 'slow' contains 'low'; 'spark' contains 'par';
    // 'he lin' crosses the word boundary in 'the line'
    assert(got == Seq("he lin", "low", "par", "scan slow", "slow", "spark"))
  }

  test("no match -> empty array; term at start/end matched; case-sensitive") {
    val rows = Seq("nothing here", "slow start", "ends with slow", "SLOW").toDF("s")
      .select(expr("graft_blocklist_hits(s, array('slow'))")).as[Seq[String]].collect()
    assert(rows(0).isEmpty && rows(1) == Seq("slow") && rows(2) == Seq("slow"))
    assert(rows(3).isEmpty) // case-sensitive, like contains
  }

  test("automaton matches the naive per-term contains on random text") {
    val dict = Array("ab", "abc", "bca", "ca", "aa", "cab", "b")
    val rnd = new scala.util.Random(11)
    val texts = Seq.fill(300)((0 until rnd.nextInt(25)).map(_ => "abc" (rnd.nextInt(3))).mkString)
    val auto = BlocklistHits.build(dict)
    texts.foreach { t =>
      val want = dict.filter(t.contains(_)).distinct.sorted.toSeq
      assert(auto.matchedTerms(t) == want, s"text '$t'")
    }
  }

  test("null text -> null; non-literal or malformed term list rejected") {
    val r = spark.sql("SELECT graft_blocklist_hits(CAST(NULL AS STRING), array('x'))")
      .collect().head
    assert(r.isNullAt(0))
    // non-literal terms: analysis-time failure
    val e = intercept[Exception](
      Seq(("a", Seq("a"))).toDF("s", "ts")
        .select(expr("graft_blocklist_hits(s, ts)")).collect())
    assert(e != null)
    // empty term: construction-time failure
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_blocklist_hits('a', array(''))").collect())
    assert(e2 != null)
  }

  test("stays in whole-stage codegen") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = spark.range(50)
        .select(expr(s"graft_blocklist_hits(concat('the line ', CAST(id AS STRING)), $terms)"))
        .as[Seq[String]].collect()
      assert(got.forall(_ == Seq("he lin")))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
