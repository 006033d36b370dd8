package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityOps

class DotQSpec extends SparkSpec {
  import spark.implicits._

  test("native dot_q equals the higher-order reference on random vectors") {
    // exclude RewriteDotProduct so the HOF side stays a REAL higher-order
    // fold (otherwise the rule rewrites the reference into the expression
    // under test and the comparison is self-referential)
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.expressions.RewriteDotProduct")
    try {
      val rnd = new scala.util.Random(5)
      val df = Seq.fill(100)((
        Seq.fill(64)(rnd.nextLong(3000000L) - 1500000L),
        Seq.fill(64)(rnd.nextLong(3000000L) - 1500000L)))
        .toDF("a", "b")
      val rows = df.select(
        SimilarityOps.dotQ(col("a"), col("b")).as("native"),
        SimilarityOps.dotQHof(col("a"), col("b")).as("hof"))
        .as[(Long, Long)].collect()
      rows.foreach { case (n, h) => assert(n == h) }
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("SQL surface: graft_dot_q is registered and callable") {
    val got = spark.sql("SELECT graft_dot_q(array(1L, 2L, 3L), array(4L, 5L, 6L))")
      .as[Long].head()
    assert(got == 32L)
  }

  test("null array -> null; null elements ignored; empty -> 0") {
    val r1 = spark.sql("SELECT graft_dot_q(NULL, array(1L))").collect().head
    assert(r1.isNullAt(0))
    val r2 = spark.sql("SELECT graft_dot_q(array(1L, NULL, 3L), array(2L, 5L, 7L))")
      .as[Long].head()
    assert(r2 == 2L + 21L)
    val r3 = spark.sql(
      "SELECT graft_dot_q(CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>))")
      .as[Long].head()
    assert(r3 == 0L)
  }

  test("length mismatch: shorter prefix wins (zip_with parity)") {
    val got = spark.sql("SELECT graft_dot_q(array(2L, 3L), array(10L, 10L, 99L))")
      .as[Long].head()
    assert(got == 50L)
  }

  test("interpreted eval path matches codegen path") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      val q = "SELECT graft_dot_q(array(7L, -2L), array(3L, 11L))"
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted = spark.sql(q).as[Long].head()
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val codegen = spark.sql(q).as[Long].head()
      assert(interpreted == codegen && codegen == -1L)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  // ------------------------------------------------ RewriteDotProduct rule

  private val Idiom =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

  // range-based (NOT a LocalRelation): ConvertToLocalRelation would fold a
  // local Seq fixture into a pre-computed LocalRelation and hide the plan
  private lazy val vecs = spark.range(50).select(
    expr("transform(sequence(0, 15), j -> (id * 31 + j * 7) % 1000 - 500)").as("a"),
    expr("transform(sequence(0, 15), j -> (id * 17 + j * 13) % 1000 - 500)").as("b"))

  test("RewriteDotProduct: the HOF idiom optimizes to the native expression") {
    val q = vecs.select(expr(Idiom).as("dot"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot_q"),
      s"idiom not rewritten:\n$optimized")
    assert(!optimized.contains("aggregate("), s"HOF survived:\n$optimized")
    // results equal the explicit native call AND a driver-side reference
    val got = q.as[Long].collect()
    val want = vecs.select(SimilarityOps.dotQ(col("a"), col("b"))).as[Long].collect()
    assert(got.sameElements(want))
    val local = vecs.as[(Seq[Long], Seq[Long])].collect()
      .map { case (x, y) => x.zip(y).map { case (p, q2) => p * q2 }.sum }
    assert(got.sameElements(local))
  }

  test("RewriteDotProduct leaves non-conforming aggregates alone") {
    // different zero, a non-multiply zip, a non-add merge, and a sum of
    // SQUARES (x*x ignores the second lambda var) must all stay HOFs
    val shapes = Seq(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 1L, (acc, v) -> acc + v)",
      "aggregate(zip_with(a, b, (x, y) -> x + y), 0L, (acc, v) -> acc + v)",
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc * v)",
      "aggregate(zip_with(a, b, (x, y) -> x * x), 0L, (acc, v) -> acc + v)")
    shapes.foreach { s =>
      val plan = vecs.select(expr(s)).queryExecution.optimizedPlan.toString
      assert(!plan.contains("graft_dot_q"), s"over-eager rewrite of: $s\n$plan")
    }
  }

  test("RewriteDotProduct preserves HOF null semantics (poison + ragged length)") {
    // parity mode: a null ELEMENT poisons the sum to null, a length
    // mismatch (zip_with pads with nulls) yields null — even though the
    // graft_dot_q SQL function's forgiving mode would skip/prefix
    val df = spark.range(1).select( // range source: no LocalRelation folding
      expr("array(1L, CASE WHEN id >= 0 THEN NULL ELSE 1L END, 3L)").as("a"),
      expr("array(2L, 5L, 7L)").as("b"),
      expr("array(2L, 3L)").as("short_b"))
    val q = df.select(expr(Idiom).as("dot"),
      expr("aggregate(zip_with(a, short_b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("ragged"))
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_dot_q"))
    val row = q.collect().head
    assert(row.isNullAt(0) && row.isNullAt(1)) // both nulls preserved
    // and the forgiving SQL function on the same inputs differs, by contract
    val skip = df.select(expr("graft_dot_q(a, b)").as("s1"),
      expr("graft_dot_q(a, short_b)").as("s2")).collect().head
    assert(skip.getLong(0) == 2L + 21L && skip.getLong(1) == 2L) // skip-null / prefix
  }

  test("both modes COMPILE under codegen (no silent interpreted fallback)") {
    // spark.sql.codegen.fallback=false turns a janino compile failure into
    // a query failure instead of a silent interpreted fallback — this is
    // the regression test for referencing ev.isNull when nullSafeCodeGen
    // never declared it (non-nullable children, skip-null mode)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(1).select(
        expr("array(1L, CASE WHEN id >= 0 THEN NULL ELSE 1L END, 3L)").as("a"),
        expr("array(2L, 5L, 7L)").as("b"),
        expr("array(2L, 3L)").as("short_b"))
      // skip mode over NON-NULLABLE arrays (expression itself non-nullable)
      val skip = df.select(expr("graft_dot_q(a, b)").as("s1"),
        expr("graft_dot_q(a, short_b)").as("s2")).collect().head
      assert(skip.getLong(0) == 23L && skip.getLong(1) == 2L)
      // parity mode via the rewrite rule (nullable expression)
      val par = df.select(expr(Idiom).as("dot")).collect().head
      assert(par.isNullAt(0))
      // parity mode over clean vectors actually computes under codegen
      val clean = vecs.select(expr(Idiom).as("dot")).limit(3).collect()
      assert(clean.length == 3 && clean.forall(!_.isNullAt(0)))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
