package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The opt-in COUNT(DISTINCT) → HLL++ rewrite: fires only under the
  * conf, only on single-argument unfiltered distinct counts, and keeps
  * every other aggregate untouched. */
class RewriteApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (0 until 2000)
    .map(i => (i % 13, (i * 7) % 97, i.toLong))
    .toDF("g", "x", "y")

  private def opted() = {
    val s2 = spark.newSession()
    s2.conf.set(RewriteApproxDistinct.ConfKey, "true")
    s2
  }

  private def planOf(q: org.apache.spark.sql.DataFrame): String =
    q.queryExecution.optimizedPlan.toString()

  test("fires on a single-column distinct count under the conf") {
    val s2 = opted()
    val q = s2.createDataFrame(df.collectAsList(), df.schema)
      .groupBy("g").agg(countDistinct(col("x")).as("nd"))
    val p = planOf(q)
    assert(p.contains("approx_count_distinct") && !p.contains("count(distinct"))
    // the estimate stays within the 5% contract of the exact count
    val exact = df.groupBy("g").agg(countDistinct(col("x")).as("nd"))
      .as[(Int, Long)].collect().toMap
    q.as[(Int, Long)].collect().foreach { case (g, est) =>
      assert(math.abs(est - exact(g)) * 100 <= exact(g) * 5, s"group $g: $est vs ${exact(g)}")
    }
  }

  test("defaults off: the same query in a plain session keeps the exact form") {
    val q = df.groupBy("g").agg(countDistinct(col("x")).as("nd"))
    assert(!planOf(q).contains("approx_count_distinct"))
  }

  test("negative shapes stay exact even when opted in") {
    val s2 = opted()
    val d2 = s2.createDataFrame(df.collectAsList(), df.schema)
    // multi-argument distinct counts TUPLES — the sketch does not model it
    val multi = d2.groupBy("g").agg(countDistinct(col("x"), col("y")).as("nd"))
    assert(!planOf(multi).contains("approx_count_distinct"))
    // FILTER clause is out of scope
    val filtered = d2.groupBy("g")
      .agg(expr("count(DISTINCT x) FILTER (WHERE y % 2 = 0)").as("nd"))
    assert(!planOf(filtered).contains("approx_count_distinct"))
    // plain (non-distinct) aggregates are untouched; a mixed aggregate
    // rewrites ONLY the distinct term
    val mixed = d2.groupBy("g")
      .agg(count(col("x")).as("n"), countDistinct(col("x")).as("nd"),
        sum(col("y")).as("s"))
    val p = planOf(mixed)
    // (the plain count folds to count(1) on the non-null column — the
    // point is it did NOT become a sketch)
    assert(p.contains("approx_count_distinct") && p.contains("count(1") &&
      p.contains("sum(y"))
  }
}
