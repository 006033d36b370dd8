package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RewriteJoinEliminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = {
    val dir = java.nio.file.Files.createTempDirectory("graft-jelim").toString
    (0 until 500).map(i => (i.toLong, i % 7, i % 11, (i * 3).toLong))
      .toDF("f_id", "f_dim1", "f_dim2", "f_val").write.parquet(s"$dir/fact")
    (0 until 7).map(i => (i, s"d1_$i")).toDF("d1_key", "d1_name")
      .write.parquet(s"$dir/dim1")
    (0 until 11).map(i => (i, s"d2_$i")).toDF("d2_key", "d2_name")
      .write.parquet(s"$dir/dim2")
    dir
  }

  private def session() = {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.unique.d1", s"$base/dim1|d1_key")
    s2.conf.set("spark.graft.unique.d2", s"$base/dim2|d2_key")
    s2
  }

  test("left join to a declared-unique key with left-only projection is eliminated") {
    val s2 = session()
    val f = s2.read.parquet(s"$base/fact")
    val d = s2.read.parquet(s"$base/dim1")
    val q = f.join(d, f("f_dim1") === d("d1_key"), "left")
      .select("f_id", "f_val").orderBy("f_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("/dim1"), plan)
    val want = s2.read.parquet(s"$base/fact").select("f_id", "f_val")
      .orderBy("f_id").as[(Long, Long)].collect().toSeq
    assert(q.as[(Long, Long)].collect().toSeq == want)
  }

  test("a CHAIN of unused dimension joins unwinds completely under an aggregate") {
    val s2 = session()
    val f = s2.read.parquet(s"$base/fact")
    val d1 = s2.read.parquet(s"$base/dim1")
    val d2 = s2.read.parquet(s"$base/dim2")
    val q = f.join(d1, f("f_dim1") === d1("d1_key"), "left")
      .join(d2, f("f_dim2") === d2("d2_key"), "left")
      .groupBy("f_dim1").agg(sum("f_val").as("sv")).orderBy("f_dim1")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("/dim1") && !plan.contains("/dim2"), plan)
    val want = s2.read.parquet(s"$base/fact")
      .groupBy("f_dim1").agg(sum("f_val").as("sv")).orderBy("f_dim1")
      .as[(Int, Long)].collect().toSeq
    assert(q.as[(Int, Long)].collect().toSeq == want)
  }

  test("NOT eliminated: dim column referenced, inner join, undeclared table, non-key join") {
    val s2 = session()
    val f = s2.read.parquet(s"$base/fact")
    val d1 = s2.read.parquet(s"$base/dim1")
    def keepsDim(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("/dim1")
    // dim column in the projection
    assert(keepsDim(f.join(d1, f("f_dim1") === d1("d1_key"), "left")
      .select("f_id", "d1_name")))
    // inner join: drops unmatched left rows, not a no-op without RI
    assert(keepsDim(f.join(d1, f("f_dim1") === d1("d1_key"))
      .select("f_id", "f_val")))
    // join on a NON-declared dim column
    assert(keepsDim(f.join(d1, f("f_dim1") === length(d1("d1_name")), "left")
      .select("f_id", "f_val")))
    // undeclared session: nothing fires at all
    val s3 = spark.newSession()
    val f3 = s3.read.parquet(s"$base/fact")
    val d3 = s3.read.parquet(s"$base/dim1")
    assert(d3.sparkSession eq s3)
    assert(f3.join(d3, f3("f_dim1") === d3("d1_key"), "left")
      .select("f_id", "f_val")
      .queryExecution.executedPlan.toString.contains("/dim1"))
  }
}
