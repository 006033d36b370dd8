package graft.expressions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def natives(df: DataFrame, k: Int): DataFrame =
    df.groupBy("g")
      .agg(call_function("graft_top_k", col("key"), col("payload"), lit(k)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rn"),
        col("col.key").as("key"), col("col.payload").as("payload"))

  private def windowed(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("g").orderBy(col("key").desc, col("payload"))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("g", "rn", "key", "payload")
  }

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  // dense key range so key ties (resolved by payload asc) actually occur
  private def randomDf(n: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextInt(20), rnd.nextLong(50L), rnd.nextLong(1000000L)))
      .toDF("g", "key", "payload").repartition(13)
  }

  test("graft_top_k equals the window-rank reference (ties included)") {
    val df = randomDf(5000, seed = 7).cache()
    assertSame(natives(df, 5), windowed(df, 5))
    assertSame(natives(df, 1), windowed(df, 1))
    df.unpersist()
  }

  test("k larger than the group returns the whole group; nulls skipped") {
    val df = Seq[(Int, java.lang.Long, java.lang.Long)](
      (1, 10L, 100L), (1, null, 7L), (1, 5L, null), (1, 3L, 300L),
      (2, 1L, 1L))
      .toDF("g", "key", "payload")
    val got = natives(df, 10).orderBy("g", "rn")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1, 1L, 10L, 100L), (1, 2L, 3L, 300L), (2, 1L, 1L, 1L)))
  }

  test("plan: ObjectHashAggregate partial+final, no WindowExec, no input sort") {
    val df = randomDf(500, seed = 11)
    val plan = natives(df, 3).queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Window"), plan)
  }

  test("sort-based fallback (serialize/deserialize/merge path) is identical") {
    val df = randomDf(3000, seed = 13).cache()
    val expected = natives(df, 4).orderBy("g", "rn").collect().toSeq
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
    try {
      val got = natives(df, 4).orderBy("g", "rn").collect().toSeq
      assert(got == expected)
    } finally {
      spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
      df.unpersist()
    }
  }

  test("Long.MinValue key sorts weakest, not strongest (negation overflow)") {
    // -Long.MinValue overflows to itself; a sortBy(-key) would rank it
    // as the strongest key. It must come LAST, and never displace others.
    val df = Seq((1, Long.MinValue, 1L), (1, 0L, 2L), (1, Long.MaxValue, 3L))
      .toDF("g", "key", "payload")
    val got = natives(df, 3).orderBy("rn")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1, 1L, Long.MaxValue, 3L), (1, 2L, 0L, 2L),
      (1, 3L, Long.MinValue, 1L)))
    val top2 = natives(df, 2).orderBy("rn")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(top2.map(_._3) == Seq(Long.MaxValue, 0L))
  }

  test("SQL surface: graft_top_k is registered") {
    val got = spark.sql(
      """SELECT graft_top_k(k, p, 2) AS top FROM VALUES
        |  (1L, 10L), (3L, 30L), (2L, 20L), (3L, 5L) AS t(k, p)""".stripMargin)
      .select(explode(col("top"))).select("col.key", "col.payload")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((3L, 5L), (3L, 30L)))
  }
}
