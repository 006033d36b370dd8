package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Mv

class RewriteAggToSummarySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dirs = {
    val base = java.nio.file.Files.createTempDirectory("graft-mv").toString
    // deterministic fact table: 2 grouping columns, 2 integer value columns
    (0 until 2000).map { i =>
      (s"g${i % 3}", s"h${i % 4}", (i * 7 % 100).toLong, (i * 13 % 50).toLong)
    }.toDF("ga", "gb", "x", "y")
      .write.parquet(s"$base/fact")
    Mv.createSummary(spark, s"$base/fact", s"$base/sum",
      Seq("ga", "gb"), Seq("x", "y"))
    base
  }

  private def inSession[A](f: org.apache.spark.sql.SparkSession => A): A = {
    val s2 = spark.newSession()
    Mv.register(s2, "spec_mv", s"$dirs/fact", s"$dirs/sum",
      Seq("ga", "gb"), Seq("x", "y"))
    f(s2)
  }

  test("rewrite fires on subset grouping and matches the base-table answer") {
    inSession { s2 =>
      val q = s2.read.parquet(s"$dirs/fact")
        .groupBy("ga")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          min("y").as("mny"), max("x").as("mxx"))
        .orderBy("ga")
      assert(q.queryExecution.executedPlan.toString.contains("/sum"),
        "plan still scans the base table")
      // ground truth from a session with NO registration
      val want = spark.read.parquet(s"$dirs/fact")
        .groupBy("ga")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          min("y").as("mny"), max("x").as("mxx"))
        .orderBy("ga")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(q.as[(String, Long, Long, Long, Long)].collect().toSeq == want)
    }
  }

  test("group-column filter is answered from the summary; exprIds survive a downstream join") {
    inSession { s2 =>
      val agg = s2.read.parquet(s"$dirs/fact")
        .filter(col("gb") =!= "h1")
        .groupBy("ga", "gb")
        .agg(sum("x").as("sx"))
      assert(agg.queryExecution.executedPlan.toString.contains("/sum"))
      // downstream operators must still resolve against the rewritten output
      val joined = agg.join(agg.select(col("ga"), col("sx").as("sx2")), "ga")
        .filter(col("sx") === col("sx2"))
        .orderBy("ga", "gb")
      val want = spark.read.parquet(s"$dirs/fact")
        .filter(col("gb") =!= "h1")
        .groupBy("ga", "gb")
        .agg(sum("x").as("sx"))
        .as[(String, String, Long)].collect().toSet
      assert(joined.select("ga", "gb", "sx")
        .as[(String, String, Long)].collect().toSet == want)
    }
  }

  test("shapes the summary cannot answer are left on the base table") {
    inSession { s2 =>
      val base = s2.read.parquet(s"$dirs/fact")
      def scansBase(df: org.apache.spark.sql.DataFrame): Boolean = {
        val p = df.queryExecution.executedPlan.toString
        p.contains("/fact") && !p.contains("/sum")
      }
      // avg: not a stored partial (only sum/min/max/cnt are)
      assert(scansBase(base.groupBy("ga").agg(avg("x"))))
      // filter on a NON-grouping column needs base rows
      assert(scansBase(base.filter(col("x") > 50).groupBy("ga").agg(sum("x"))))
      // DISTINCT aggregate cannot re-aggregate from partials
      assert(scansBase(base.groupBy("ga").agg(countDistinct("y"))))
      // aggregate over a non-MV column
      assert(scansBase(base.withColumn("z", col("x") + 1).groupBy("ga").agg(sum("z"))))
      // grouping by a non-MV expression
      assert(scansBase(base.groupBy(length(col("ga")).as("l")).agg(sum("x"))))
    }
  }

  test("refreshIncremental(delta) == full recompute, including all-null value groups") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mvref").toString
    val base = Seq(("a", Some(1L)), ("a", Some(3L)), ("b", None))
      .toDF("g", "x")
    val delta = Seq(("a", Some(10L)), ("b", None), ("c", Some(7L)), ("d", None))
      .toDF("g", "x")
    base.write.parquet(s"$dir/t")
    Mv.createSummary(spark, s"$dir/t", s"$dir/s", Seq("g"), Seq("x"))
    delta.write.mode("append").parquet(s"$dir/t")
    Mv.refreshIncremental(spark, delta, s"$dir/s", Seq("g"), Seq("x"))
    // ground truth: recompute the summary from the unioned table
    Mv.createSummary(spark, s"$dir/t", s"$dir/s2", Seq("g"), Seq("x"))
    def read(p: String) = spark.read.parquet(p)
      .orderBy("g")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(read(s"$dir/s") == read(s"$dir/s2"))
    // group d exists with a NULL sum/min/max (not zero): the asymmetric
    // coalesce must not fabricate values
    val d = read(s"$dir/s").find(_._1 == "d").get
    assert(d._2 == 1L && d._3.isEmpty && d._4.isEmpty && d._5.isEmpty)
  }

  test("global count(*) over an empty-matching filter returns 0, not NULL") {
    inSession { s2 =>
      // no grouping at all: a bare sum(mv_cnt) would return NULL here; the
      // coalesce form must restore count(*)'s 0-on-empty and non-nullability
      val q = s2.read.parquet(s"$dirs/fact")
        .filter(col("ga") === "no_such_group")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"))
      assert(q.queryExecution.executedPlan.toString.contains("/sum"),
        "global aggregate should still be answered from the summary")
      assert(!q.schema("n").nullable, "count(*) must stay non-nullable")
      val got = q.collect().head
      assert(got.getLong(0) == 0L && got.isNullAt(1))
      val want = spark.read.parquet(s"$dirs/fact")
        .filter(col("ga") === "no_such_group")
        .agg(count(lit(1)).as("n"), sum("x").as("sx")).collect().head
      assert(got == want)
    }
  }

  test("unregistered sessions are untouched; unregister restores the base plan") {
    // the shared spec session has no registration at all
    val p = spark.read.parquet(s"$dirs/fact").groupBy("ga").agg(sum("x"))
      .queryExecution.executedPlan.toString
    assert(p.contains("/fact") && !p.contains("/sum"))
    inSession { s2 =>
      Mv.unregister(s2, "spec_mv")
      val p2 = s2.read.parquet(s"$dirs/fact").groupBy("ga").agg(sum("x"))
        .queryExecution.executedPlan.toString
      assert(p2.contains("/fact") && !p2.contains("/sum"))
    }
  }
}
