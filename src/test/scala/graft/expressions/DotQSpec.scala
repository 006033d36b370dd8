package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityOps

class DotQSpec extends SparkSpec {
  import spark.implicits._

  test("native dot_q equals the higher-order reference on random vectors") {
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
}
